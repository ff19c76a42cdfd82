"""Distributed BPE tokenizer training (Sennrich et al. 2016, byte-pair
encoding on word-internal character pairs) and the matching encoder.

Why this distributes well: after the first word-count aggregate the
iterative phase never touches the corpus again — it runs on the DISTINCT
word table (vocabulary-sized: millions of rows at 100 TB corpus scale,
not billions), so each merge iteration is one map-only projection plus
one small pair-count aggregate.  The per-iteration driver traffic is a
single (pair, count) row.

Representation: a word is its space-joined symbol string ("h e l l o");
a merge rewrites left-to-right occurrences of " A B " to " AB " on the
delimiter-padded string — the same scan order Python's ``str.replace``,
Spark's ``replace`` and DuckDB's ``replace`` all implement, which is
what makes the unrolled-SQL oracle exact.

Known deviation from Sennrich on REPEATED-symbol runs: consecutive
occurrences share the padding delimiter, so one replace pass merges
alternate occurrences only ("a a a a" -> "aa a a", where canonical BPE
yields "aa aa").  The leftover adjacency is re-counted and may be
selected again in a later round (a duplicate (pair, merged) rule that
``encode_bpe`` replays identically), so train/encode/oracle stay
mutually exact — but runs of the same symbol can take extra merge
slots vs a reference BPE trainer.  Natural-language corpora have few
such runs; exact Sennrich semantics would need a stateful array fold
the SQL oracle cannot mirror.

Simplification vs the paper: no end-of-word marker symbol (merges never
cross word boundaries either way); tie-breaks are (count DESC, pair
ASC), deterministic across engines for ASCII corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoparquet_io_spark.operators.text import tokens


def word_counts(df: DataFrame, text_column: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens of lowercased text."""
    from geoparquet_io_spark.operators.skew import spread

    return (spread(df)
            .select(F.explode(tokens(F.lower(F.col(text_column))))
                    .alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _char_split(word):
    """'hello' -> 'h e l l o' (one space between code points)."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def _pair_counts(sym_df: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol table.  Overlapping
    occurrences all count (Sennrich's get_stats), each weighted by the
    word's corpus frequency."""
    arr = F.split(F.col("sym"), " ")
    pairs = (sym_df.withColumn("a", arr)
             .filter(F.size("a") >= 2)
             .select("cnt", F.explode(F.expr(
                 "transform(sequence(1, size(a) - 1), "
                 "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
             )).alias("pair")))
    return pairs.groupBy("pair").agg(F.sum("cnt").alias("c"))


def _select_disjoint(ranked, batch_size: int):
    """Greedy admission from a (pair, count)-ranked list of the pairs
    that can merge TOGETHER without deviating from sequential BPE.

    A merge of P = (a, b) only rewrites adjacencies that TOUCH the
    consumed occurrence — it destroys (x, a) and (b, y) instances and
    creates (x, ab) / (ab, y) — so a later pair Q = (c, d) keeps its
    exact pre-batch count unless it chains onto P.  Q is therefore
    admitted unless, against any already-admitted P:

    * ``c == P.b`` or ``d == P.a`` (Q's adjacency instances can be
      consumed by P's merge — its sequential count would differ), or
    * ``c``/``d``/``merged(Q)`` collides with ``P.merged`` (the batch's
      single rewrite projection would also rewrite text P just created,
      which sequential ordering would count first).

    Sharing a LEFT symbol (o w / o r) or RIGHT symbol (s t / a t) is
    safe: the shared symbol's instances are disjoint between the two
    adjacencies, so counts and rewrites commute.

    OUTRANKING GUARD (makes batch == sequential PROVABLE, not just
    likely): sequential BPE might pick a pair P's merge just CREATED —
    (x, ab) or (ab, y) — before a later batch member Q.  A created
    pair's count is bounded by its chaining pair's pre-merge count
    (every "x ab" comes from an "x a b", so count(x, ab) <=
    count(x, a)), and every chaining pair counting >= Q is in the
    ranked pool.  Q is admitted only if it STRICTLY exceeds both the
    pool's minimum count (covers chain pairs below the pool horizon)
    and every admitted P's chaining-pair counts — so no created pair
    can outrank any admitted pair and the batch replays the sequential
    order exactly.  Admitted pairs' recorded pre-batch counts equal the
    sequential algorithm's counts."""
    if not ranked:
        return []
    poolmin = ranked[-1][1]
    split = [(p.split(" "), c) for p, c in ranked]
    chosen = []
    for pair, c in ranked:
        a, b = pair.split(" ")
        merged = a + b
        conflict = False
        for p_pair, p_merged, _ in chosen:
            pa, pb = p_pair.split(" ")
            if pair == p_pair or a == pb or b == pa \
                    or p_merged in (a, b, merged):
                conflict = True
                break
            bound = max([cc for (qq, cc) in split
                         if qq[1] == pa or qq[0] == pb] + [poolmin])
            if c <= bound:
                conflict = True
                break
        if conflict:
            continue
        chosen.append((pair, merged, c))
        if len(chosen) >= batch_size:
            break
    return chosen


#: vocab tables at or under this row count run the merge loop on the
#: driver (see train_bpe) — sized so the collected state is a few MB,
#: like collecting k-means centroids
LOCAL_VOCAB_ROWS = 65_536


def _train_local(vocab: list[tuple[str, int]], num_merges: int,
                 min_pair_count: int, batch_size: int):
    """Driver-side merge loop over a collected (sym, cnt) vocab —
    byte-identical semantics to the Spark loop below: same weighted
    adjacent-pair counts, same (count DESC, pair ASC) top pool taken
    BEFORE the min-count filter, same _select_disjoint admission, and
    str.replace shares F.replace's left-to-right non-overlapping scan
    (the module docstring's engine-exactness argument)."""
    syms = list(vocab)
    merges: list[tuple] = []
    pool_n = max(4 * batch_size, 8)
    while len(merges) < num_merges:
        pc: dict[str, int] = {}
        for s, c in syms:
            a = s.split(" ")
            for i in range(len(a) - 1):
                p = a[i] + " " + a[i + 1]
                pc[p] = pc.get(p, 0) + c
        pool = sorted(pc.items(), key=lambda t: (-t[1], t[0]))[:pool_n]
        ranked = [(p, c) for p, c in pool if c >= min_pair_count]
        chosen = _select_disjoint(
            ranked, min(batch_size, num_merges - len(merges)))
        if not chosen:
            break
        for pair, merged, c in chosen:
            merges.append((len(merges) + 1, pair, merged, c))
        new_syms = []
        for s, c in syms:
            t = " " + s + " "
            for pair, merged, _c in chosen:
                t = t.replace(f" {pair} ", f" {merged} ")
            new_syms.append((t.strip(" "), c))
        syms = new_syms
    return merges


def train_bpe(df: DataFrame, text_column: str = "text",
              num_merges: int = 16, min_pair_count: int = 2,
              batch_size: int = 1,
              local_vocab_rows: int | None = LOCAL_VOCAB_ROWS) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a corpus.  Returns a small
    DataFrame (rank, pair, merged, pair_count) in merge order.

    Each iteration: one pair-count aggregate over the vocab table
    (map-side combine), one tiny top-pool collect, one map-only rewrite
    projection applying the whole batch.  The vocab table is
    localCheckpoint-ed each round so lineage and codegen depth stay
    O(1) across iterations.

    ``batch_size`` > 1 merges up to that many provably-independent top
    pairs per Spark round (see :func:`_select_disjoint`: chain-conflict
    exclusion + created-pair outranking guard), cutting driver
    round-trips toward ~num_merges/batch_size: a 30k-merge tokenizer at
    batch 64 approaches ~500 rounds instead of 30k jobs.  The admission
    rule makes batched output IDENTICAL to strictly sequential training
    on every corpus — rounds adaptively shrink (down to 1 merge) when
    top pairs chain into each other rather than ever deviating.

    ``local_vocab_rows``: when the distinct-word table fits in this many
    rows (a bounded LIMIT probe — never an unbounded collect), the merge
    loop runs on the DRIVER over the collected vocab, identical
    semantics, zero per-iteration Spark jobs — the k-means-centroids
    pattern: the corpus-sized work (word_counts) stays distributed, the
    vocabulary-sized iteration doesn't pay job-scheduling latency per
    round.  Web-scale corpora blow past the cap and take the distributed
    loop; pass ``None`` to force it."""
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    spark = df.sparkSession
    words = word_counts(df, text_column)
    sym = words.select(_char_split(F.col("word")).alias("sym"), "cnt")
    # checkpoint BEFORE the route probe: the probe's LIMIT would
    # otherwise run the full word-count pass and throw it away whenever
    # the vocab exceeds the cap, and the distributed loop would then
    # recompute the identical lineage — one wasted corpus pass on every
    # large training run
    sym = sym.localCheckpoint(eager=True)
    schema = "rank long, pair string, merged string, pair_count long"
    if local_vocab_rows:
        head = sym.limit(local_vocab_rows + 1).collect()
        if len(head) <= local_vocab_rows:
            merges = _train_local(
                [(r["sym"], int(r["cnt"])) for r in head],
                num_merges, min_pair_count, batch_size)
            return spark.createDataFrame(merges, schema)
    merges = []
    while len(merges) < num_merges:
        pool = (_pair_counts(sym)
                .orderBy(F.desc("c"), F.asc("pair"))
                .limit(max(4 * batch_size, 8)).collect())
        ranked = [(r["pair"], int(r["c"])) for r in pool
                  if int(r["c"]) >= min_pair_count]
        chosen = _select_disjoint(
            ranked, min(batch_size, num_merges - len(merges)))
        if not chosen:
            break
        out = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
        for pair, merged, c in chosen:
            merges.append((len(merges) + 1, pair, merged, c))
            out = F.replace(out, F.lit(f" {pair} "), F.lit(f" {merged} "))
        sym = sym.select(F.trim(out).alias("sym"), "cnt")
        sym = sym.localCheckpoint(eager=True)
    return spark.createDataFrame(merges, schema)


def encode_bpe(df: DataFrame, merges: list[tuple[str, str]],
               text_column: str = "text",
               out_column: str = "bpe_tokens") -> DataFrame:
    """Apply learned merges (list of (pair, merged) in rank order) to
    every word of ``text_column``; adds ``out_column`` as the array of
    BPE tokens for the document.

    Map-only: the merge chain compiles to one projection (each merge is
    a literal string replace).  Keep merge counts moderate (<~200) per
    projection — chain a second ``encode_bpe`` call for larger vocabs
    to stay inside codegen limits."""
    words = tokens(F.lower(F.col(text_column)))
    sym = F.transform(words, lambda w: _char_split(w))
    for pair, merged in merges:
        sym = F.transform(sym, lambda s: F.trim(F.replace(
            F.concat(F.lit(" "), s, F.lit(" ")),
            F.lit(f" {pair} "), F.lit(f" {merged} "))))
    flat = F.flatten(F.transform(sym, lambda s: F.split(s, " ")))
    return df.withColumn(out_column,
                         F.filter(flat, lambda t: F.length(t) > 0))

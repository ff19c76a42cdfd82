"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup — all built from
NATIVE Spark expressions (md5 + array functions inside codegen; shuffles
only on the grouping keys).  At 100 TB: shingling/minhashing is map-only;
the only shuffles are the band-bucket groupBys whose keys are short
hashes (well distributed, no skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --- exact -------------------------------------------------------------------

def dedup_exact(df: DataFrame, columns: list[str] | None = None,
                key_column: str | None = None) -> DataFrame:
    """Drop exact duplicates on ``columns`` (default: all columns —
    minus ``key_column`` when given); when ``key_column`` is given,
    keep the row with the smallest key (deterministic survivor) instead
    of an arbitrary one."""
    # the key must not be part of the default grouping: a unique key in
    # the partition columns makes every row its own group and the call
    # silently deduplicates nothing
    if columns is not None and not columns:
        raise ValueError(
            "dedup_exact: columns=[] would silently compare ALL "
            "columns; pass None for that, or a non-empty list")
    cols = columns if columns is not None else \
        [c for c in df.columns if c != key_column]
    if key_column is None:
        return df.dropDuplicates(cols)
    w_cols = [F.col(c) for c in cols]
    from pyspark.sql import Window

    w = Window.partitionBy(*w_cols).orderBy(F.col(key_column).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_groups(df: DataFrame, columns: list[str],
                     key_column: str) -> DataFrame:
    """(group value, survivor key, group size) — the inspection companion."""
    return df.groupBy(*columns).agg(
        F.min(key_column).alias("survivor"),
        F.count("*").alias("group_size"),
    )


# --- shingling ---------------------------------------------------------------

def shingles(text: Column, k: int = 5) -> Column:
    """All k-character shingles (array<string>; empty when len(text) < k).
    Pure native expr: sequence + transform + substring.  NB: sequence(1, 0)
    yields a DESCENDING [1, 0] — the when() guard is load-bearing."""
    n = F.length(text) - F.lit(k - 1)
    seq = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(seq, lambda i: F.substring(text, i, k))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-grams joined by single spaces.  Blank/whitespace-only
    text yields an EMPTY array (F.split of '' returns [''], which at
    n=1 made every blank doc jaccard-1.0 match every other blank doc —
    r8 review)."""
    toks = F.filter(F.split(F.trim(text), r"\s+"),
                    lambda t: F.length(t) > 0)
    cnt = F.size(toks) - F.lit(n - 1)
    seq = F.when(cnt >= 1, F.sequence(F.lit(0), cnt - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(seq, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


# --- MinHash + LSH -----------------------------------------------------------

#: hot-bucket guard default for minhash_candidate_pairs (and its SQL
#: oracle) — chosen above real bucket maxima at the test scale factors
#: (60 @ sf0.01, 478 @ sf0.1) so normal corpora are byte-identical
DEFAULT_MAX_BUCKET_SIZE = 128

def minhash_signatures_agg(df: DataFrame, id_column: str,
                           text_column: str = "text", num_hashes: int = 8,
                           k: int = 5) -> DataFrame:
    """(id, mh0..mhN-1 as BIGINT) via the SCALABLE shape: explode shingles,
    md5 each ONCE, derive the N hash functions as h1 + i*h2 from the md5's
    two 32-bit halves (Kirsch-Mitzenmacher double hashing), then
    partial-aggregate mins map-side.  One md5 per shingle total — the
    naive N-seeded form costs N md5s per shingle."""
    from geoparquet_io_spark.operators.skew import spread

    # shingle explode + md5 dominates: restore scan parallelism when the
    # file layout denies it (no-op on multi-file lakes; measured ~6x at
    # sf0.1 on single-row-group inputs)
    df = spread(df)
    sh = df.select(
        F.col(id_column).alias("id"),
        F.explode(shingles(F.col(text_column), k)).alias("s"),
    ).select("id", F.md5(F.col("s")).alias("h"))
    h1 = F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring("h", 9, 8), 16, 10).cast("long")
    sh = sh.select("id", h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def _band_rows(num_hashes: int, bands: int) -> int:
    """rows-per-band with the divisibility check EVERY banded entry
    point shares (silently flooring dropped trailing hash functions —
    a different LSH s-curve than the caller asked for)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    return num_hashes // bands


def minhash_bands(df: DataFrame, text_column: str = "text",
                  num_hashes: int = 8, bands: int = 4, k: int = 5,
                  signature_column: str = "minhash",
                  id_column: str | None = None) -> DataFrame:
    """Add the signature and one band-hash column per band; rows sharing a
    band hash are LSH candidates (banding per Broder/MMDS).
    Rows whose text has no shingles (len < k) are dropped."""
    rows = _band_rows(num_hashes, bands)
    join_key = id_column or "__mh_rid"
    if id_column:
        work = df
    else:
        # PIN the synthesized row ids: the signature branch and the
        # join's left side would otherwise recompute
        # monotonically_increasing_id independently, and on a
        # nondeterministic upstream (shuffle fetch order, task retry)
        # the two runs can disagree — attaching another row's signature
        # or dropping rows from the inner join (r8 review).  EAGER: a
        # lazy local checkpoint only caches on first computation, and
        # the join's two branches are independent shuffle-map stages
        # that can concurrently compute the same parent partition on
        # different executors before any block is cached — the eager
        # materialization is what actually closes the race (r8 ADVICE;
        # train_bpe pays the same cost for the same reason)
        work = df.withColumn(join_key, F.monotonically_increasing_id()) \
            .localCheckpoint(eager=True)
    sigs = minhash_signatures_agg(work, join_key, text_column, num_hashes, k)
    out = work.join(sigs.withColumnRenamed("id", join_key), join_key, "inner")
    out = out.withColumn(
        signature_column, F.array(*[F.col(f"mh{i}") for i in range(num_hashes)])
    )
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        out = out.withColumn(f"band_{b}", F.md5(F.concat_ws(",", *parts)))
    out = out.drop(*[f"mh{i}" for i in range(num_hashes)])
    if not id_column:
        out = out.drop(join_key)
    return out


def minhash_candidate_pairs(df: DataFrame, id_column: str,
                            text_column: str = "text", num_hashes: int = 8,
                            bands: int = 4, k: int = 5,
                            max_bucket_size: int | None =
                            DEFAULT_MAX_BUCKET_SIZE) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) that collide in >=1 band.

    One signature computation (explode+agg), then ONE self-join on the
    exploded (band_index, band_hash) key — short uniform hashes, no skew
    FROM THE HASHING, but a boilerplate corpus still concentrates m
    near-identical documents into one bucket and the all-pairs emission
    is m(m-1)/2: measured 70M pairs / 49s from 50k rows on a 10x corpus
    (SCALING.md) where the original took 1.1s.  ``max_bucket_size``
    guards that quadratic: buckets with more members emit a sorted-id
    PREDECESSOR CHAIN (m-1 edges) instead of all pairs — the same cap
    pattern as ``semantic_dedup``'s max_cluster_size.  The chain
    preserves exactly what downstream consumers rely on:

    - connectivity (transitive groups / survivor sets are identical:
      every bucket member stays reachable through the chain);
    - the "collides with a smaller id" rule (every non-min member has a
      chain predecessor with a smaller id, so it appears as id_b).

    What it forgoes is per-pair verification BETWEEN two far-apart
    members of a hot bucket — for mutual-dup masses (the only way a
    bucket gets hot) consecutive pairs verify identically, and callers
    needing the literal all-pairs contract pass
    ``max_bucket_size=None``.

    The small banded table is localCheckpoint'ed so the self-join's two
    sides don't recompute the signature pipeline (RDD-level storage the
    ContextCleaner auto-releases on GC — no leaked cache entry)."""
    rows = _band_rows(num_hashes, bands)
    sigs = minhash_signatures_agg(df.select(F.col(id_column), F.col(text_column)),
                                  id_column, text_column, num_hashes, k)
    band_arr = F.array(*[
        F.md5(F.concat_ws(",", *[F.col(f"mh{b * rows + r}").cast("string")
                                 for r in range(rows)]))
        for b in range(bands)
    ])
    exploded = sigs.select(
        F.col("id"), F.posexplode(band_arr).alias("band", "bh")
    ).localCheckpoint(eager=False)
    if max_bucket_size is None:
        a = exploded.alias("a")
        b = exploded.alias("b")
        return (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    from pyspark.sql import Window

    # one shuffle on the bucket key sizes every bucket; the small-bucket
    # self-join and the hot-bucket chain window both reuse that
    # partitioning (no second Exchange — asserted in tests/test_plans.py)
    wc = Window.partitionBy("band", "bh")
    sized = exploded.withColumn("__n", F.count("*").over(wc))
    small = sized.filter(F.col("__n") <= max_bucket_size).drop("__n")
    a = small.alias("a")
    b = small.alias("b")
    all_pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    ws = Window.partitionBy("band", "bh").orderBy("id")
    chain = (
        sized.filter(F.col("__n") > max_bucket_size)
        .withColumn("__prev", F.lag("id").over(ws))
        .filter(F.col("__prev").isNotNull())
        .select(F.col("__prev").alias("id_a"), F.col("id").alias("id_b"))
    )
    return all_pairs.unionByName(chain).distinct()


def minhash_star_edges(df: DataFrame, id_column: str,
                       text_column: str = "text", num_hashes: int = 8,
                       bands: int = 4, k: int = 5) -> DataFrame:
    """LSH candidate edges in STAR form: each row pairs only with the
    MINIMUM id of every band bucket it lands in — (id_a=bucket min,
    id_b=member), distinct, id_a < id_b.

    Candidate-pair volume is the all-pairs form's Achilles heel at
    scale: a boilerplate cluster of m near-identical documents puts m
    rows in one bucket and emits m(m-1)/2 pairs — measured on a 10x
    corpus (scripts/scale_curve.py), 50k docs produced 70M pairs and a
    156s wall where the 5k original took 1.1s.  Star edges emit <= m-1
    edges per bucket (O(n*bands) total) yet preserve EXACTLY the
    results that matter downstream:

    - survivor rule "drop every id that collides with any smaller id":
      a row collides with a smaller id iff it is not the minimum of
      some bucket iff it appears as id_b in a star edge;
    - connected components: any two members of a bucket stay connected
      through the bucket's min, so the transitive groups are identical.

    What star edges canNOT express is per-pair similarity verification
    between two non-min members — use minhash_candidate_pairs when each
    candidate pair must be individually confirmed.
    """
    rows = _band_rows(num_hashes, bands)
    sigs = minhash_signatures_agg(
        df.select(F.col(id_column), F.col(text_column)),
        id_column, text_column, num_hashes, k)
    band_arr = F.array(*[
        F.md5(F.concat_ws(",", *[F.col(f"mh{b * rows + r}").cast("string")
                                 for r in range(rows)]))
        for b in range(bands)
    ])
    # localCheckpoint: `reps` below joins back against `exploded`, and
    # without it BOTH join sides re-run the signature explode/md5/min-agg
    # pipeline — the dominant cost (same fix minhash_candidate_pairs has)
    exploded = sigs.select(
        F.col("id"), F.posexplode(band_arr).alias("band", "bh")
    ).localCheckpoint(eager=False)
    # one partial-aggregating shuffle on the bucket key, then the star:
    # min_by pattern via groupBy + join-free window would re-shuffle;
    # aggregate min then broadcast-size join is wrong for big buckets —
    # a plain shuffle join on the SAME key reuses the partitioning.
    reps = exploded.groupBy("band", "bh").agg(F.min("id").alias("rep"))
    edges = (
        exploded.join(reps, ["band", "bh"])
        .filter(F.col("id") != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col("id").alias("id_b"))
        .distinct()
    )
    return edges


def dedup_minhash(df: DataFrame, id_column: str, text_column: str = "text",
                  num_hashes: int = 8, bands: int = 4, k: int = 5,
                  jaccard_threshold: float | None = None,
                  pair_mode: str = "star") -> DataFrame:
    """Remove near-duplicates: among rows colliding in any band (optionally
    confirmed by shingle Jaccard >= threshold), keep the smallest id.

    Survivor rule matches 'first document wins' with ids as arrival order.
    ``pair_mode="star"`` (default) generates candidate edges via
    :func:`minhash_star_edges` — identical survivors, linear edge volume
    in boilerplate-heavy corpora.  With ``jaccard_threshold`` set the
    all-pairs form is required (each pair is individually verified) and
    ``pair_mode`` is ignored.
    """
    if pair_mode not in ("star", "pairs"):
        raise ValueError(f"pair_mode must be 'star' or 'pairs', got "
                         f"{pair_mode!r}")
    if jaccard_threshold is None and pair_mode == "star":
        edges = minhash_star_edges(df, id_column, text_column,
                                   num_hashes, bands, k)
        losers = edges.select(F.col("id_b").alias(id_column)).distinct()
        return df.join(losers, id_column, "left_anti")
    # per-pair Jaccard verification REQUIRES the literal all-pairs form:
    # a chain through a hot bucket could pair only non-duplicate
    # neighbors (A,B,A,B boilerplate interleave) and verification would
    # reject every edge, keeping all duplicates.  The unverified
    # "pairs" mode only needs survivor equivalence, which the capped
    # form preserves — keep the guard there.
    pairs = minhash_candidate_pairs(
        df, id_column, text_column, num_hashes, bands, k,
        max_bucket_size=None if jaccard_threshold is not None
        else DEFAULT_MAX_BUCKET_SIZE)
    if jaccard_threshold is not None:
        sh = df.select(F.col(id_column).alias("id"),
                       F.array_distinct(shingles(F.col(text_column), k)).alias("sh"))
        pairs = (
            pairs.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
            .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
            .filter(F.col("inter") / F.greatest(F.col("uni"), F.lit(1)) >= jaccard_threshold)
            .select("id_a", "id_b")
        )
    # a row is dropped iff it collides with ANY smaller id (transitive
    # star-shaped dedup, same policy as ml.feature MinHashLSH examples)
    losers = pairs.select(F.col("id_b").alias(id_column)).distinct()
    return df.join(losers, id_column, "left_anti")


# --- SimHash -----------------------------------------------------------------

def add_simhash(df: DataFrame, text_column: str = "text",
                column: str = "simhash", k: int = 5,
                id_column: str | None = None) -> DataFrame:
    """16-bit SimHash over k-shingles.  Bits come from the first 4 hex
    chars of md5(shingle); each bit votes +-1 weighted by occurrence.

    Scalable shape: explode shingles, md5 ONCE per shingle, 16 partial-agg
    bit sums map-side, reassemble the hash after the groupBy.  (A pure
    expression tree re-hashes every shingle 16x — measured 20x slower.)
    Rows whose text has no shingles (len < k) are dropped."""
    from geoparquet_io_spark.operators.skew import spread

    join_key = id_column or "__sh_rid"
    if id_column:
        work = df
    else:
        # pinned for the same two-branch consistency reason as
        # minhash_bands (r8 review); eager, because a lazy checkpoint
        # leaves a concurrent-first-computation race open (r8 ADVICE)
        work = df.withColumn(join_key, F.monotonically_increasing_id()) \
            .localCheckpoint(eager=True)
    # md5-per-shingle dominates; gated scan-parallelism restore (no-op on
    # real multi-file lakes).  Runs AFTER the row-id assignment so ids
    # stay stable regardless of the repartition.
    work = spread(work)
    sh = work.select(
        F.col(join_key).alias("id"),
        F.explode(shingles(F.col(text_column), k)).alias("s"),
    ).select(
        "id",
        F.conv(F.substring(F.md5(F.col("s")), 1, 4), 16, 10).cast("long").alias("hv"),
    )
    aggs = []
    for bit in range(16):
        # bit index from the most-significant nibble down (hex char bit//4,
        # in-char shift 3-bit%4) == integer bit 15-bit
        vote = F.when(F.shiftright(F.col("hv"), 15 - bit) % 2 == 1,
                      F.lit(1)).otherwise(F.lit(-1))
        aggs.append(F.sum(vote).alias(f"b{bit}"))
    sums = sh.groupBy("id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for bit in range(16):
        sim = sim + F.when(F.col(f"b{bit}") > 0,
                           F.lit(1 << (15 - bit)).cast("long")).otherwise(F.lit(0).cast("long"))
    sums = sums.select(F.col("id").alias(join_key), sim.alias(column))
    out = work.join(sums, join_key, "inner")
    if not id_column:
        out = out.drop(join_key)
    return out


# --- n-gram Jaccard ----------------------------------------------------------

def jaccard_pairs(df: DataFrame, id_column: str, pairs: DataFrame,
                  text_column: str = "text", k: int = 5,
                  use_words: bool = False, n: int = 3) -> DataFrame:
    """Jaccard similarity of shingle sets for given (id_a, id_b) pairs."""
    gram = word_ngrams(F.col(text_column), n) if use_words else shingles(F.col(text_column), k)
    sh = df.select(F.col(id_column).alias("id"), F.array_distinct(gram).alias("sh"))
    return (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select(
            "id_a", "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Transitive duplicate groups (connected components)
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iterations: int = 20,
                         id_column: str = "id",
                         component_column: str = "component") -> DataFrame:
    """Connected components over a duplicate-pair edge list: every node
    gets the MINIMUM id reachable through any chain of pairs (a~b, b~c =>
    a, b, c share one group) — the transitive closure a dedup pipeline
    needs after pairwise candidates (minhash/LSH emit PAIRS, and keeping
    one survivor per PAIR over-deletes chains).

    Scale design: iterative min-label propagation (the standard
    large-graph approach — each round is one shuffle: edges joined to
    current labels, min over neighbors, map-side combined).  Converges in
    O(component diameter) rounds; duplicate chains are short in practice,
    and ``max_iterations`` bounds the worst case.  Each round's result is
    localCheckpoint()ed so the plan does not grow exponentially.

    Beyond-reference operator (the reference dedups exact keys only);
    semantics follow the classic iterative min-propagation algorithm.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    # label(node) = min(node, min over neighbors' labels), iterate to fixpoint
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src").agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label")))
                .alias("label"),
            )
        )
        # pointer jumping: also adopt the label OF my label, doubling the
        # propagated distance per round -> convergence in O(log diameter)
        # rounds instead of O(diameter); fixpoint is identical
        hop = new_labels.select(F.col("node").alias("lnode"),
                                F.col("label").alias("llabel"))
        new_labels = (
            new_labels.join(hop, new_labels["label"] == hop["lnode"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("llabel"), F.col("label")))
                .alias("label"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds 2^iterations) — raise "
            "max_iterations; returning partial labels would silently "
            "under-deduplicate")
    return labels.select(F.col("node").alias(id_column),
                         F.col("label").alias(component_column))


def dedup_transitive(df: DataFrame, pairs: DataFrame, id_column: str,
                     id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Keep ONE survivor (the minimum id) per transitive duplicate group;
    rows in no pair survive untouched.  Anti-join shape — scales."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b,
                                id_column="__node", component_column="__comp")
    losers = comp.filter(F.col("__node") != F.col("__comp")).select("__node")
    return df.join(losers, df[id_column] == losers["__node"], "left_anti")


def dedup_keep_best(df: DataFrame, pairs: DataFrame, id_column: str,
                    score_column: str,
                    id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Keep the HIGHEST-SCORING row of each transitive duplicate group
    (production dedup keeps the best-quality copy, not the smallest id —
    the C4/RefinedWeb convention of preferring the longest/cleanest
    duplicate).  Ties break on the lower id for determinism.

    Shape: connected components (pointer-jumping, bounded rounds) ->
    join scores -> one partitioned window over groups (each group is
    tiny) -> anti-join the losers.  Rows in no pair pass through.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, id_a=id_a, id_b=id_b,
                                id_column="__node", component_column="__comp")
    scored = comp.join(
        df.select(F.col(id_column).alias("__node"),
                  F.col(score_column).alias("__score")),
        "__node")
    w = Window.partitionBy("__comp").orderBy(F.desc("__score"), F.asc("__node"))
    losers = (scored.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") > 1).select("__node"))
    return df.join(losers, df[id_column] == losers["__node"], "left_anti")


#: simhash hot-bucket cap: a 16-bit signature has only 16 nibble values
#: per band, so bucket population grows LINEARLY with corpus size and
#: the all-pairs band join grows quadratically — the r8 100x curve blew
#: >79 GB of shuffle spill at 500k docs (every bucket ~31k members).
#: 512 sits well above the sf0.01 oracle corpus's measured bucket
#: maximum (178), so the capped path never triggers at oracle scale.
SIMHASH_MAX_BUCKET_SIZE = 512


def simhash_candidate_pairs(df: DataFrame, id_column: str,
                            text_column: str = "text", k: int = 5,
                            max_hamming: int = 3,
                            max_bucket_size: int | None =
                            SIMHASH_MAX_BUCKET_SIZE) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance <= ``max_hamming``
    over the 16-bit signature — bucketed by nibble bands so the pair space
    never goes all-pairs.

    Pigeonhole completeness: 4 nibble bands and ``max_hamming <= 3``
    differing bits guarantee at least one band is IDENTICAL, so the
    band equi-join loses no qualifying pair.  (For larger budgets raise
    the band count or signature width.)  Shape: signature (explode +
    partial-agg votes) -> 4-band explode -> self-join on (band, nibble)
    -> distinct -> exact bit_count(xor) filter.  Same banding scheme as
    minhash LSH; the signature table is persisted so the join's two
    sides don't recompute it.

    ``max_bucket_size`` guards the quadratic the 16-bit signature makes
    STRUCTURAL at scale (16 nibble values per band -> bucket size is
    n/16, and with P(hamming<=3) ~ 1% between random 16-bit sigs the
    literal pair OUTPUT is itself quadratic): buckets past the cap pair
    at SIGNATURE granularity — same-signature members chain by
    ascending id (hamming-0 edges, verification never breaks them) and
    distinct signatures pair all-vs-all through min-id representatives
    (<= 4096 distinct sigs per nibble regardless of corpus size).  The
    signature-level pigeonhole guarantee therefore SURVIVES the cap:
    every pair of near-dup groups meets through its representatives and
    the hamming-0 chains carry the edge to every member.  What's
    forgone vs the literal contract is only WHICH witness pair links
    two groups (reps + chains instead of every cross pair) — identical
    connectivity, survivors, and "collides with a smaller id" sets.
    Callers needing every literal pair row pass
    ``max_bucket_size=None`` — and at real scale should use a wider
    signature (hamming_dedup_survivors takes bands/band_bits).
    """
    if not (0 <= max_hamming <= 3):
        raise ValueError(
            f"max_hamming must be in [0, 3] for 4-nibble banding "
            f"(pigeonhole bound), got {max_hamming}")
    sigs = add_simhash(df, text_column=text_column, k=k,
                       id_column=id_column).select(
        F.col(id_column).alias("id"), F.col("simhash").cast("long").alias("sh"))
    sigs = sigs.localCheckpoint(eager=False)
    banded = sigs.select(
        "id", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("b"),
                     (F.shiftright(F.col("sh"), 4 * b) % 16).alias("nib"))
            for b in range(4)
        ])).alias("band"),
    ).select("id", "sh", F.col("band.b").alias("b"), F.col("band.nib").alias("nib"))
    if max_bucket_size is not None:
        from pyspark.sql import Window

        # size every bucket once; the small-bucket self-join and the
        # hot-bucket windows reuse the (b, nib) partitioning.
        # Checkpointed: four consumers fan out of `sized` (small-bucket
        # join a/b sides, the hamming-0 chain window, the rep join) and
        # would otherwise each recompute the banding+count lineage
        # (r8 ADVICE — the docstring's "persisted" claim now holds on
        # the capped path too)
        wc = Window.partitionBy("b", "nib")
        sized = banded.withColumn("__n", F.count("*").over(wc)) \
            .localCheckpoint(eager=False)
        banded = sized.filter(F.col("__n") <= max_bucket_size).drop("__n")
        hot = sized.filter(F.col("__n") > max_bucket_size).drop("__n")
        # hot buckets pair at SIGNATURE granularity, not id order:
        # (1) same-signature members chain by ascending id — every edge
        #     is hamming 0, so verification never breaks the chain and
        #     a boilerplate mass stays one component (a plain id-chain
        #     interleaved DIFFERENT signatures and lost far-apart
        #     identical pairs when the in-between edge failed hamming);
        # (2) DISTINCT signatures pair all-vs-all via their min-id
        #     representatives — <= 4096 distinct sigs per nibble no
        #     matter the corpus size, so the pair space is bounded and
        #     the signature-level pigeonhole guarantee survives the
        #     cap: two near-dup groups always meet through their reps,
        #     and the hamming-0 chains carry that edge to every member.
        ws_sig = Window.partitionBy("b", "nib", "sh").orderBy("id")
        chain = (hot
                 .withColumn("__pid", F.lag("id").over(ws_sig))
                 .filter(F.col("__pid").isNotNull()
                         & (F.col("__pid") < F.col("id")))
                 .select(F.col("__pid").alias("id_a"),
                         F.col("id").alias("id_b"),
                         F.col("sh").alias("sh_a"),
                         F.col("sh").alias("sh_b")))
        reps = hot.groupBy("b", "nib", "sh").agg(F.min("id").alias("rid"))
        ra = reps.select("b", "nib", F.col("sh").alias("sh_a"),
                         F.col("rid").alias("id_a"))
        rb = reps.select("b", "nib", F.col("sh").alias("sh_b"),
                         F.col("rid").alias("id_b"))
        rep_pairs = (ra.join(rb, ["b", "nib"])
                     .filter(F.col("id_a") < F.col("id_b"))
                     .select("id_a", "id_b", "sh_a", "sh_b"))
        chain = chain.unionByName(rep_pairs)
    else:
        chain = None
    a = banded.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "b", "nib")
    bb = banded.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "b", "nib")
    pairs = (a.join(bb, ["b", "nib"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sh_a", "sh_b"))
    if chain is not None:
        pairs = pairs.unionByName(chain)
    pairs = pairs.distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def hamming_dedup_survivors(sigs: DataFrame, id_column: str = "id",
                            sig_column: str = "sig", max_hamming: int = 3,
                            bands: int = 4, band_bits: int = 4) -> DataFrame:
    """Survivor ids for the rule "drop every id whose signature is within
    ``max_hamming`` of a SMALLER id's signature" — computed at
    DISTINCT-SIGNATURE level.

    Hamming distance depends only on the signatures, so the pairing can
    collapse every row sharing a signature into one node first: a
    boilerplate mass of a million identical documents is ONE node, and
    for a 16-bit SimHash the graph has at most 65,536 nodes total no
    matter the corpus size.  Exactness:

    - same-signature: id survives its group iff it IS the group min;
    - cross-signature: a smaller id with a qualifying signature exists
      iff the minimum id of some hamming-neighbor signature is smaller.

    Banding is the usual pigeonhole scheme (``max_hamming < bands`` with
    ``bands * band_bits`` covering the signature width) applied to the
    distinct-signature table.  Returns one column: ``id_column``.
    """
    if not 0 <= max_hamming < bands:
        raise ValueError(
            f"max_hamming must be < bands={bands} for pigeonhole "
            f"completeness, got {max_hamming}")
    s = sigs.select(F.col(id_column).alias("id"),
                    F.col(sig_column).cast("long").alias("sg"))
    groups = s.groupBy("sg").agg(F.min("id").alias("min_id"))
    groups = groups.localCheckpoint(eager=False)
    mask = (1 << band_bits) - 1
    banded = groups.select(
        "sg", "min_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("b"),
                     F.shiftrightunsigned(F.col("sg"), band_bits * b)
                     .bitwiseAND(F.lit(mask)).alias("v"))
            for b in range(bands)
        ])).alias("band"),
    ).select("sg", "min_id", F.col("band.b").alias("b"),
             F.col("band.v").alias("v"))
    a = banded.select(F.col("sg").alias("sg_a"),
                      F.col("min_id").alias("m_a"), "b", "v")
    bb = banded.select(F.col("sg").alias("sg_b"),
                       F.col("min_id").alias("m_b"), "b", "v")
    ham = F.bit_count(F.col("sg_a").bitwiseXOR(F.col("sg_b")))
    # directed neighbor edges (both directions fall out of sg_a != sg_b)
    nbr = (a.join(bb, ["b", "v"])
           .filter(F.col("sg_a") != F.col("sg_b"))
           .filter(ham <= max_hamming)
           .select(F.col("sg_a").alias("sg"), F.col("m_b").alias("nbr_min"))
           .groupBy("sg").agg(F.min("nbr_min").alias("nbr_min")))
    keep = (s.join(groups, "sg")
            .join(nbr, "sg", "left")
            .filter((F.col("id") == F.col("min_id"))
                    & (F.col("nbr_min").isNull()
                       | (F.col("nbr_min") > F.col("id"))))
            .select(F.col("id").alias(id_column)))
    return keep


def dedup_simhash(df: DataFrame, id_column: str, text_column: str = "text",
                  k: int = 5, max_hamming: int = 3) -> DataFrame:
    """Remove near-duplicates by SimHash hamming distance: keep the
    smallest id of every near-dup neighborhood (same "first document
    wins" policy as :func:`dedup_minhash`).  Runs on the
    distinct-signature graph (:func:`hamming_dedup_survivors`), so
    boilerplate masses cost one node, not a quadratic pair set."""
    sigs = add_simhash(df, text_column=text_column, k=k,
                       id_column=id_column) \
        .select(F.col(id_column), F.col("simhash"))
    keep = hamming_dedup_survivors(sigs, id_column, "simhash",
                                   max_hamming=max_hamming,
                                   bands=4, band_bits=4)
    # anti-join on the LOSERS: rows whose text has no shingles never
    # enter the signature table and duplicate nothing — a left_semi on
    # the keep set silently deleted every short/NULL document, unlike
    # dedup_minhash (r8 review)
    losers = sigs.select(id_column).join(keep, id_column, "left_anti")
    return df.join(losers, id_column, "left_anti")


def dedup_against_index(new_df: DataFrame, index_bands: DataFrame,
                        id_column: str, text_column: str = "text",
                        num_hashes: int = 8, bands: int = 4,
                        k: int = 5) -> DataFrame:
    """Incremental-ingest dedup: drop NEW documents that LSH-collide with
    an EXISTING corpus whose band table was built once and PERSISTED
    (``minhash_bands`` output) — the production shape where yesterday's
    100 TB corpus is never recomputed to admit today's batch.

    Both sides explode to (band_index, band_hash) keys; one equi-join
    marks collisions; the new batch is LEFT-ANTI-joined on the flagged
    ids.  Returns the surviving new rows (original columns).
    """
    nb = minhash_bands(new_df, text_column, num_hashes, bands, k,
                       id_column=id_column)

    def explode_bands(df: DataFrame, keep: str) -> DataFrame:
        arr = F.array(*[
            F.struct(F.lit(b).alias("b"), F.col(f"band_{b}").alias("bh"))
            for b in range(bands)
        ])
        return (df.select(F.col(keep).alias("__id"), F.explode(arr).alias("e"))
                .select("__id", F.col("e.b").alias("b"), F.col("e.bh").alias("bh")))

    new_e = explode_bands(nb, id_column)
    idx_e = explode_bands(index_bands, id_column)
    flagged = (new_e.join(idx_e.select("b", "bh").distinct(), ["b", "bh"])
               .select(F.col("__id")).distinct())
    return new_df.join(flagged, new_df[id_column] == flagged["__id"],
                       "left_anti")

"""Deterministic, reproducible sampling for training-data pipelines.

RNG-based sampling (``df.sample``/``rand()``) is neither stable across
retries/partitionings nor mirrorable in a SQL oracle.  These operators
sample by HASHING A KEY: the same row always makes the same decision, on
any cluster, in any engine — the property a 100 TB curation pipeline
needs for resumable, auditable subsets (and what makes an exact DuckDB
oracle possible).

Beyond-reference operators (the reference's only sampler is ORDER BY
random() LIMIT k, core/check_spatial_order.py:38-39).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 is bit-identical across Spark and DuckDB (same reason the minhash
# oracle works); use the first 8 hex chars as a uniform 32-bit draw
_BUCKETS = 1 << 32


def _md5_u32(s: Column) -> Column:
    """md5 hex -> uniform integer in [0, 2^32) (first 8 hex chars) —
    the one hashing recipe every sampler here shares, so the draw scheme
    can only change in one place."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _hash_draw(key: Column, salt: str) -> Column:
    """Uniform integer in [0, 2^32) from (salt, key) — deterministic.
    NULL keys hash a sentinel rather than propagating NULL (a NULL draw
    would silently drop the row from every filter and concentrate nulls
    into one split); all null-key rows share one draw, so they move as a
    block — deterministic, never silently lost."""
    k = F.coalesce(key.cast("string"), F.lit("\x00__null_key__"))
    return _md5_u32(F.concat(F.lit(salt), F.lit(":"), k))


def _check_hist(hist, score_column: str, token_column: str) -> None:
    """Loud validation of the bucket histogram both budget selectors
    collect: NULL/NaN scores corrupt the driver-side bucket ordering
    (all comparisons against a float NaN are False, so Python's sorted()
    places that bucket arbitrarily — possibly FIRST, spending budget on
    garbage); NULL and negative token counts break the monotone
    running-sum precondition the prefix-equivalence proof requires.
    All four are upstream data errors, caught from the histogram pass at
    zero extra scans."""
    if any(r["__b"] is None for r in hist):
        raise ValueError(
            f"{score_column!r} contains NULLs — filter or impute before "
            "budget selection")
    if any(r["__b"] != r["__b"] for r in hist):
        raise ValueError(
            f"{score_column!r} contains NaNs — filter or impute before "
            "budget selection")
    if any(r["__nt"] for r in hist):
        raise ValueError(
            f"{token_column!r} contains NULLs — filter or impute before "
            "budget selection")
    if any(r["__mn"] is not None and r["__mn"] < 0 for r in hist):
        raise ValueError(
            f"{token_column!r} contains negative counts — the "
            "running-sum selection requires non-negative tokens")


def sample_by_hash(df: DataFrame, key_column: str, fraction: float,
                   salt: str = "sample") -> DataFrame:
    """Keep ~``fraction`` of rows, decided by md5(salt:key) — stable under
    retries, repartitioning, and engine changes.  Map-only (no shuffle,
    no RNG state); the filter stays in whole-stage codegen."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * _BUCKETS)
    return df.filter(_hash_draw(F.col(key_column), salt) < F.lit(threshold))


def mixture_sample(df: DataFrame, key_column: str, group_column: str,
                   fractions: dict, salt: str = "mix",
                   default_fraction: float = 0.0) -> DataFrame:
    """Per-group sampling rates (training-data mixture weighting): e.g.
    ``{"web": 0.1, "wiki": 1.0, "code": 0.5}``.  One map-only pass; the
    per-group threshold is a CASE cascade in codegen, so the plan is a
    single filtered scan — no per-group jobs, no shuffle."""
    for g, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(
            f"default_fraction must be in [0, 1], got {default_fraction}")
    thr = F.lit(int(default_fraction * _BUCKETS))
    for g, frac in sorted(fractions.items()):
        thr = F.when(F.col(group_column) == g,
                     F.lit(int(frac * _BUCKETS))).otherwise(thr)
    return df.filter(_hash_draw(F.col(key_column), salt) < thr)


def _split_expr(draw: Column, weights: dict) -> Column:
    """CASE cascade mapping a uniform [0, 2^32) draw to a split name by
    cumulative weight, names in sorted order."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    for name, w in weights.items():
        # a negative weight offset by another still sums to 1 but makes
        # its cumulative threshold negative — that split is silently
        # empty and its mass is misassigned to the next split
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {w}")
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = draw < F.lit(int(acc * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def split_by_hash(df: DataFrame, key_column: str, weights: dict,
                  salt: str = "split", split_column: str = "split") -> DataFrame:
    """Disjoint, exhaustive train/valid/test-style assignment: weights
    like ``{"train": 0.98, "valid": 0.01, "test": 0.01}`` map each key
    into one split by its hash position — stable, leakage-free (a key
    always lands in the same split), map-only."""
    draw = _hash_draw(F.col(key_column), salt)
    return df.withColumn(split_column, _split_expr(draw, weights))


def leakage_safe_split(df: DataFrame, id_column: str, groups: DataFrame,
                       weights: dict, salt: str = "split",
                       split_column: str = "split",
                       group_id_column: str = "id",
                       group_rep_column: str = "component") -> DataFrame:
    """Group-aware train/valid/test split: every member of a near-dup
    GROUP lands in the same split, so test examples can never be
    near-duplicates of training examples (the contamination mode a plain
    per-id ``split_by_hash`` cannot prevent — Lee et al. 2022 measured
    several percent of eval sets leaking this way).

    ``groups``: (id, representative) pairs — the output of
    ``dedup.connected_components`` over near-dup pairs (LSH, SemDeDup,
    or embedding buckets).  Ids absent from ``groups`` are singleton
    groups and split by their own id, so the assignment is exhaustive.

    Scale shape: one equi-join on the id (the groups side holds only
    ids that HAVE a near-dup — typically a small fraction of the corpus,
    AQE-broadcastable) followed by the map-only hash split on the
    representative.  No windows, no skew: a giant dup group is one key.
    """
    # one rep per id, LOUDLY: a groups table with duplicate ids (say the
    # raw near-dup PAIR list instead of connected-components output)
    # would duplicate corpus rows through the join — silently inflating
    # the written dataset.  The aggregate is on the (small) groups side;
    # conflicting reps for one id raise at execution.
    g = (groups.groupBy(F.col(group_id_column).alias("__gid"))
         .agg(F.min(group_rep_column).alias("__rep"),
              F.count_distinct(F.col(group_rep_column)).alias("__n")))
    g = g.select(
        "__gid",
        # __n == 0: the id's only rep was NULL (count_distinct skips
        # NULLs) -> fall through to the own-id coalesce, don't raise
        F.when(F.col("__n") <= 1, F.col("__rep")).otherwise(
            F.raise_error(F.concat(
                F.lit("leakage_safe_split: id "),
                F.col("__gid").cast("string"),
                F.lit(" maps to multiple group representatives — pass "
                      "connected-components output, not raw pairs")))
            .cast(g.schema["__rep"].dataType)).alias("__rep"))
    j = df.join(g, F.col(id_column) == F.col("__gid"), "left").drop("__gid")
    rep = F.coalesce(F.col("__rep"), F.col(id_column))
    return (j.withColumn(split_column,
                         _split_expr(_hash_draw(rep, salt), weights))
            .drop("__rep"))


def stratified_take(df: DataFrame, key_column: str, stratum_column: str,
                    n_per_stratum: int, salt: str = "strat") -> DataFrame:
    """EXACT-count per-stratum sampling: rank rows inside each stratum by
    their deterministic hash draw and keep the first ``n_per_stratum``.

    Rate-based sampling (``mixture_sample``) gives binomial counts; when a
    curation recipe says "exactly 10k docs per language", this is the
    operator.  The draw-ordered rank is a uniform random-without-
    replacement sample, yet fully reproducible across retries, engines
    and partitionings (same reason as ``sample_by_hash``).

    Scale shape: one shuffle on the stratum key + a partitioned window —
    no global sort, no RNG.  Skewed strata are bounded by the window's
    per-partition top-n (rows beyond n are dropped at the sort spill).
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    from pyspark.sql import Window

    draw = _hash_draw(F.col(key_column), salt)
    w = (Window.partitionBy(stratum_column)
         .orderBy(draw.asc(), F.col(key_column).asc()))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_stratum)
            .drop("__rn"))


def select_under_token_budget(df: DataFrame, budget: int,
                              id_column: str = "doc_id",
                              score_column: str = "score",
                              token_column: str = "n_tokens",
                              bucket_digits: int = 3) -> DataFrame:
    """Pick the highest-scoring documents whose cumulative token count
    fits a budget — the "best 10B tokens" curation selector.

    Semantics (exact, oracle-mirrorable): order rows by
    ``(score DESC, id ASC)`` and keep every row whose INCLUSIVE running
    token sum is <= budget.  Tokens are positive, so the kept set is a
    prefix of the order.

    Scale shape — NO global sort/window:
      1. histogram scores into ``round(score, bucket_digits)`` buckets
         (score must live in a bounded range like [0,1]; bucket count is
         then <= 10^bucket_digits + 1, a driver-safe table),
      2. driver-side cumulative sum over the sorted bucket table finds
         the buckets that fit entirely and the single BOUNDARY bucket,
      3. full buckets pass with a map-only filter; only the boundary
         bucket (~1/buckets of the data) runs a windowed running sum,
         offset by the full buckets' total.

    Equivalent to the global-window rule because the running sum is
    monotone.  Returns the selected rows (original columns).
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    b = F.round(F.col(score_column), bucket_digits)
    hist = (df.groupBy(b.alias("__b"))
            .agg(F.sum(token_column).alias("__t"),
                 F.count(F.when(F.col(token_column).isNull(), 1))
                 .alias("__nt"),
                 F.min(token_column).alias("__mn"))
            .collect())
    # NULL scores would crash the driver sort; NULL token counts are
    # skipped by SUM and would ride along free, silently blowing the
    # budget — both are upstream data errors, fail loudly (checked from
    # the histogram pass: zero extra scans)
    _check_hist(hist, score_column, token_column)
    # NOTE: bucket-level ordering uses __b DESC; rows inside one bucket
    # order by (score DESC, id) — combined, this is exactly
    # (score rounded DESC, score DESC, id), the canonical order above
    # up to rounding granularity (document scores that straddle a bucket
    # edge order by their rounded value first — deterministic both sides).
    buckets = sorted(((r["__b"], r["__t"]) for r in hist), reverse=True)
    cum = 0
    full: list[float] = []
    boundary = None
    offset = 0
    for bv, t in buckets:
        if cum + t <= budget:
            full.append(bv)
            cum += t
        else:
            boundary = bv
            offset = cum
            break
    out_cols = df.columns
    dfb = df.withColumn("__b", b)
    kept_full = dfb.filter(F.col("__b").isin(full)) if full else None
    if boundary is None:
        return kept_full.select(*out_cols) if kept_full is not None \
            else df.filter(F.lit(False))
    w = (Window.partitionBy("__b")
         .orderBy(F.col(score_column).desc(), F.col(id_column).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    kept_boundary = (
        dfb.filter(F.col("__b") == boundary)
        .withColumn("__run", F.sum(token_column).over(w))
        .filter(F.lit(offset) + F.col("__run") <= budget)
    )
    kept_boundary = kept_boundary.select(*out_cols)
    if kept_full is None:
        return kept_boundary
    return kept_full.select(*out_cols).unionByName(kept_boundary)


def mixture_under_token_budget(df: DataFrame, budgets: dict,
                               group_column: str = "source",
                               id_column: str = "doc_id",
                               score_column: str = "score",
                               token_column: str = "n_tokens",
                               bucket_digits: int = 3) -> DataFrame:
    """Per-group token-budget selection — the mixture-building shape of
    Pile/Dolma-style corpus assembly ("the best X tokens from web, Y
    from code, ..."): within each group, keep the highest-scoring docs
    whose inclusive running token sum fits that group's budget.  Groups
    absent from ``budgets`` are dropped.

    Scale shape mirrors :func:`select_under_token_budget`, generalized:
    ONE (group, score-bucket) histogram (driver-safe:
    |groups| x 10^bucket_digits rows), a per-group driver cumsum to find
    each group's full buckets + single boundary bucket, a map-only
    filter for full buckets, and a running-sum window over ONLY the
    boundary buckets, partitioned by (group, bucket).  Rounding is
    monotone, so bucket-major order equals global score order and the
    result exactly equals the per-group global-window prefix rule.
    """
    from pyspark.sql import Window

    for g, v in budgets.items():
        if v < 0:
            raise ValueError(f"budget for {g!r} must be >= 0, got {v}")
    groups = sorted(budgets)
    df = df.filter(F.col(group_column).isin(groups))
    b = F.round(F.col(score_column), bucket_digits)
    hist = (df.groupBy(F.col(group_column).alias("__g"), b.alias("__b"))
            .agg(F.sum(token_column).alias("__t"),
                 F.count(F.when(F.col(token_column).isNull(), 1))
                 .alias("__nt"),
                 F.min(token_column).alias("__mn"))
            .collect())
    _check_hist(hist, score_column, token_column)
    per_group: dict = {g: [] for g in groups}
    for r in hist:
        per_group[r["__g"]].append((r["__b"], r["__t"]))
    full: dict = {}
    boundary: dict = {}
    offset: dict = {}
    for g in groups:
        cum = 0
        full[g] = []
        for bv, t in sorted(per_group[g], reverse=True):
            if cum + t <= budgets[g]:
                full[g].append(bv)
                cum += t
            else:
                boundary[g] = bv
                offset[g] = cum
                break
    out_cols = df.columns
    dfb = df.withColumn("__b", b)
    gcol = F.col(group_column)
    full_cond = F.lit(False)
    for g in groups:
        if full[g]:
            full_cond = full_cond | ((gcol == g) & F.col("__b").isin(full[g]))
    kept_full = dfb.filter(full_cond)
    bound_cond = F.lit(False)
    for g in boundary:
        bound_cond = bound_cond | ((gcol == g) & (F.col("__b") == boundary[g]))
    if not boundary:
        return kept_full.select(*out_cols)
    off_expr = F.lit(0).cast("long")
    budget_expr = F.lit(0).cast("long")
    for g in boundary:
        off_expr = F.when(gcol == g, F.lit(offset[g])).otherwise(off_expr)
        budget_expr = F.when(gcol == g,
                             F.lit(int(budgets[g]))).otherwise(budget_expr)
    w = (Window.partitionBy(group_column, "__b")
         .orderBy(F.col(score_column).desc(), F.col(id_column).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    kept_boundary = (
        dfb.filter(bound_cond)
        .withColumn("__run", F.sum(token_column).over(w))
        .filter(off_expr + F.col("__run") <= budget_expr)
        .select(*out_cols)
    )
    return kept_full.select(*out_cols).unionByName(kept_boundary)


def weighted_take(df: DataFrame, key_column: str, weight_column: str,
                  n: int, stratum_column: str | None = None,
                  salt: str = "wtake") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES,
    public algorithm): each row gets priority ``u^(1/w)`` with ``u`` a
    deterministic hash draw in (0,1); the top-``n`` priorities are a
    weighted sample without replacement.  Quality-weighted corpus
    subsampling, reproducible across retries/engines like the other
    hash samplers.

    With ``stratum_column``: top-n per stratum (one shuffle + partitioned
    window); without: global top-n via TakeOrderedAndProject (no
    single-partition window).  Weights must be > 0 — rows with null or
    non-positive weight are rejected loudly rather than silently biased.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql import Window

    w = F.col(weight_column).cast("double")
    # (draw + 0.5) / 2^32 lies strictly inside (0,1): u=0 would send every
    # priority to 0 and u=1 would tie at 1 regardless of weight.
    # Weight validation rides INSIDE the priority expression (one pass):
    # a standalone pre-scan would double the input I/O on every call.
    u = (_hash_draw(F.col(key_column), salt).cast("double") + 0.5) / float(_BUCKETS)
    priority = F.when(
        w.isNull() | (w <= 0.0),
        F.raise_error(F.concat(
            F.lit(f"weighted_take requires positive weights in "
                  f"{weight_column!r}, got "),
            F.coalesce(w.cast("string"), F.lit("NULL")))).cast("double"),
    ).otherwise(F.pow(u, F.lit(1.0) / w))
    ranked = df.withColumn("__p", priority)
    if stratum_column is None:
        return (ranked.orderBy(F.desc("__p"), F.asc(key_column))
                .limit(n).drop("__p"))
    win = (Window.partitionBy(stratum_column)
           .orderBy(F.desc("__p"), F.asc(key_column)))
    return (ranked.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= n).drop("__p", "__rn"))


def dsir_select(source_df: DataFrame, target_df: DataFrame, n: int,
                id_column: str = "doc_id", text_column: str = "text",
                num_features: int = 1024, salt: str = "dsir") -> DataFrame:
    """Data Selection via Importance Resampling (public method: Xie et
    al. 2023, arXiv:2302.03169 — the standard way to pick pretraining
    data that "looks like" a small target domain):

    1. hashed unigram features: token -> md5 bucket in [0, num_features);
    2. Laplace-smoothed bucket distributions for target and source;
    3. per-document importance log-weight
       ``sum_b count_b * log(p_target_b / p_source_b)``;
    4. weighted sampling without replacement via Efraimidis-Spirakis in
       LOG space: priority ``log(-log(u)) - logweight`` ascending (the
       Gumbel-trick form of ``u^(1/w)`` — fully log-domain, so it
       neither overflows nor underflows for extreme importance ratios),
       top-``n`` by priority.

    Scale shape: two tiny bucket-count aggregates (num_features rows,
    broadcast back), one explode + broadcast join + per-doc sum with
    map-side combine, then TakeOrderedAndProject for the top-n — no
    single-partition window, no driver data.  Log-ratios are quantized
    to integer micro-nats before summation (order-independent,
    engine-exact).  Returns the selected source rows + ``logweight``.
    """
    from geoparquet_io_spark.operators.text import tokens

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def bucket(tok):
        # unsalted on purpose (the SQL oracle embeds md5(token) without
        # a salt prefix); the hex->u32 step is the shared _md5_u32
        return _md5_u32(tok) % num_features

    def bucket_counts(df):
        toks = df.select(
            F.explode(tokens(F.lower(F.col(text_column)))).alias("t")
        ).filter(F.length("t") > 0)
        return toks.groupBy(bucket(F.col("t")).alias("b")) \
            .agg(F.count("*").alias("c"))

    tc = {r["b"]: r["c"] for r in bucket_counts(target_df).collect()}
    sc = {r["b"]: r["c"] for r in bucket_counts(source_df).collect()}
    t_total = sum(tc.values()) + num_features
    s_total = sum(sc.values()) + num_features
    import math

    # micro-nat quantized log ratios, one literal map (bounded:
    # num_features entries — the "hashed" in hashed-DSIR is exactly what
    # keeps this table broadcastable at any corpus size)
    ratios = {
        b: int(round((math.log((tc.get(b, 0) + 1) / t_total)
                      - math.log((sc.get(b, 0) + 1) / s_total)) * 1e6))
        for b in range(num_features)
    }
    mapping = F.create_map(
        *[F.lit(v) for kv in ratios.items() for v in kv])
    doc_toks = source_df.select(
        F.col(id_column).alias("__id"),
        F.explode(tokens(F.lower(F.col(text_column)))).alias("t"),
    ).filter(F.length("t") > 0)
    lw = (doc_toks
          .select("__id", mapping[bucket(F.col("t"))].alias("__lr"))
          .groupBy("__id")
          .agg(F.sum("__lr").alias("__lw_micro")))
    u = (_hash_draw(F.col("__id"), salt).cast("double") + 0.5) \
        / float(_BUCKETS)
    # stable Gumbel form ln(-ln u) - lw, ASCENDING — equivalent ordering
    # to maximizing ln(u)*exp(-lw), but exp(-lw) underflows to 0.0 past
    # ~745 nats and collapsed every strongly-on-target doc into a tie
    # broken by id; the log-domain form never saturates
    priority = F.log(-F.log(u)) - F.col("__lw_micro") / F.lit(1e6)
    picked = (lw.withColumn("__p", priority)
              .orderBy(F.asc("__p"), F.asc("__id"))
              .limit(n))
    return (source_df.join(
        picked.select(F.col("__id").alias(id_column),
                      F.round(F.col("__lw_micro") / 1e6, 6)
                      .alias("logweight")),
        id_column))


def pack_sequences(df: DataFrame, max_tokens: int,
                   id_column: str = "doc_id",
                   token_column: str = "n_tokens") -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents laid
    end-to-end in ``id_column`` order are cut into fixed
    ``max_tokens``-token training chunks; each document learns where it
    landed.  (The standard pretraining packing — public practice in the
    GPT/T5 data pipelines; boundary documents span two or more chunks.)

    Output per input row: ``(id, n_tokens, start_offset, first_chunk,
    last_chunk, chunks_spanned)`` where ``start_offset`` is the
    EXCLUSIVE running token sum over all smaller ids, ``first_chunk =
    start_offset div max_tokens`` and ``last_chunk`` is the chunk of
    the document's final token (empty documents sit wholly in
    ``first_chunk``).

    Scale shape — a distributed prefix sum, NO single-reducer global
    window:

      1. ``repartitionByRange(id)`` then pin the partitioning
         (localCheckpoint — the range sampler is nondeterministic, and
         the partial table and the per-partition scan must see the
         SAME boundaries);
      2. one tiny agg: per-partition token totals (one row per
         partition, driver-side prefix over <= shuffle.partitions
         rows — KB scale at any corpus size);
      3. per-partition running sum (window partitioned by the pinned
         partition id) plus the broadcast prefix offset.

    Token counts must be non-negative — validated from the same
    partials agg at zero extra cost.
    """
    from pyspark.sql import Window

    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be > 0, got {max_tokens}")
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                          "32"))
    ranged = (df.repartitionByRange(n_part, F.col(id_column))
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=False))
    partials = (ranged.groupBy("__pid")
                .agg(F.sum(token_column).alias("__t"),
                     F.min(token_column).alias("__mn"),
                     F.sum(F.col(token_column).isNull().cast("int"))
                     .alias("__nulls"))
                .collect())
    neg = [r for r in partials if r["__mn"] is not None and r["__mn"] < 0]
    if neg:
        raise ValueError(
            f"negative token counts in {token_column!r} "
            f"(e.g. {neg[0]['__mn']}); packing needs n_tokens >= 0")
    n_null = sum(r["__nulls"] or 0 for r in partials)
    if n_null:
        # a NULL count would silently contribute 0 to offsets while the
        # row's own chunk columns come out null — fail loudly instead
        raise ValueError(
            f"{n_null} NULL values in {token_column!r}; packing needs "
            "a concrete token count for every row (fill or filter "
            "nulls first)")
    # range partition i holds strictly smaller ids than i+1, so the
    # prefix over partition ids IS the prefix over the id order
    prefix: dict[int, int] = {}
    run = 0
    for r in sorted(partials, key=lambda r: r["__pid"]):
        prefix[r["__pid"]] = run
        run += int(r["__t"] or 0)
    spark = df.sparkSession
    pre = F.broadcast(spark.createDataFrame(
        [(int(k), int(v)) for k, v in prefix.items()] or [(0, 0)],
        ["__pid", "__prefix"]))
    w = (Window.partitionBy("__pid").orderBy(F.col(id_column).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    n = F.col(token_column).cast("long")
    start = (F.coalesce(F.sum(token_column).over(w), F.lit(0)).cast("long")
             + F.col("__prefix"))
    first = F.floor(start / F.lit(max_tokens)).cast("long")
    last = F.floor((start + F.greatest(n, F.lit(1)) - 1)
                   / F.lit(max_tokens)).cast("long")
    return (ranged.join(pre, "__pid")
            .select(
                F.col(id_column),
                n.alias("n_tokens"),
                start.alias("start_offset"),
                first.alias("first_chunk"),
                last.alias("last_chunk"),
                (last - first + 1).cast("int").alias("chunks_spanned"),
            ))

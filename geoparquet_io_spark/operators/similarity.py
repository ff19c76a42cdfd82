"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, plus a
random-hyperplane-LSH bucketed variant as the 100 TB scale path
(candidates only meet inside buckets — the cross product never
materializes globally).

Per-row/per-pair vector math is native array higher-order functions.
(An unrolled fixed-dim add-chain variant was MEASURED SLOWER: 64-term
chains per pair overflow whole-stage codegen's class budget and fall
back to the interpreted path with worse constants — keep the HOF
forms.)  The brute-force path broadcasts the (small) query set.

Exception: SemDeDup's dense all-pairs scoring runs as Arrow-batched
numpy kernels (interpreted HOF costs ~0.3us per ELEMENT; a gram-matrix
block in numpy is two orders faster) — with dim-order accumulation so
the float64 results are bit-identical to the HOF fold.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_array(col: Column, dim: int | None = None,
                    where: str = "embedding") -> Column:
    """Cast to array<double>; with ``dim`` given, a LOUD error on any
    row whose vector length differs.  zip_with silently NULL-pads
    mismatched lengths, which cascaded to silently-empty IVF results
    and single-bucket LSH instead of an error.

    A NULL vector passes through as NULL — one missing embedding must
    not kill the job (the cosine()/kernel paths already treat NULL as
    "no result", and before this guard ``F.size(NULL)`` made the when
    condition NULL, routing NULL rows into raise_error with a NULL
    message).  Only a PRESENT vector of the wrong length raises."""
    arr = F.transform(col, lambda v: v.cast("double"))
    if dim is None:
        return arr
    return (
        F.when(col.isNull(), F.lit(None).cast("array<double>"))
        .when(F.size(arr) == dim, arr)
        .otherwise(F.raise_error(F.concat(
            F.lit(f"{where}: vector length "),
            F.coalesce(F.size(arr).cast("string"), F.lit("NULL")),
            F.lit(f" != dim={dim}"))).cast("array<double>")))


def is_valid_embedding(col: Column, dim: int | None = None) -> Column:
    """Boolean: the vector is non-NULL, (optionally) exactly ``dim``
    long, and every element is present and FINITE.

    The hygiene predicate for ANN inputs (r10): Spark and DuckDB share
    the IEEE total order where NaN ranks ABOVE every real number, so a
    single NaN-component embedding scores cosine = NaN against every
    query and hijacks rank 1 of every top-k list (the engines agree —
    it is data poisoning, not an engine bug; measured: one NaN vector
    displaced the true nearest neighbour of every query).  Filter (or
    quarantine) with this BEFORE the topk/dedup/kmeans paths.  Native
    expressions only — JVM-side, no UDF."""
    inner_bad = F.exists(
        col, lambda x: x.isNull() | F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == F.lit(float("inf"))))
    ok = col.isNotNull() & ~inner_bad
    if dim is not None:
        ok = ok & (F.size(col) == dim)
    return ok


def filter_valid_embeddings(df: DataFrame, vector_column: str = "embedding",
                            dim: int | None = None,
                            flag_column: str | None = None) -> DataFrame:
    """Drop rows whose ``vector_column`` fails :func:`is_valid_embedding`
    (NULL vector, NULL element, NaN/Inf element, or wrong ``dim``).
    With ``flag_column`` set, no rows are dropped — the verdict is
    appended as a boolean column instead (the quarantine workflow)."""
    ok = is_valid_embedding(F.col(vector_column), dim)
    if flag_column is not None:
        return df.withColumn(flag_column, ok)
    return df.filter(ok)


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product (``dim`` accepted for API stability; the HOF fold is
    the fast form under codegen constraints — see module docstring)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    # NULL (not an ANSI DIVIDE_BY_ZERO crash) for a zero-norm vector:
    # Spark 4 defaults ANSI on, so one all-zero embedding (a common
    # padding artifact) would otherwise kill every similarity job.
    # NULLs sink under desc ordering — matching the Arrow kernel, whose
    # 0/0 = NaN compares IEEE-false everywhere.
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


MAX_BRUTE_QUERIES = 131_072

#: cap on the (rows x queries) float64 score matrix a task materializes
#: at once inside the brute-force kernel (~32 MB per array at 4M cells)
_SCORE_CELLS = 4_000_000


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    query_id_column: str | None = None,
    k: int = 10,
    round_digits: int | None = 6,
    dim: int | None = None,
    score_cells: int = _SCORE_CELLS,
) -> DataFrame:
    """Exact top-k neighbours per query vector.

    The query set is collected (small by contract — it rides into every
    task; > ``MAX_BRUTE_QUERIES`` is a loud error pointing at the
    lsh/ivf scale paths).  Scoring runs as an Arrow-batched numpy kernel
    with DIM-ORDER float64 accumulation, so every emitted cosine is
    bit-identical to the ``F.aggregate`` fold (the `_cross_losers_arrow`
    trick) — the DuckDB oracle's left-to-right sum matches exactly.
    Each task emits only its partition-local top candidates per query
    (a small tie window above k, see ``_topk_tie_cap``), so the final
    row_number window shuffles <= tasks * |q| * C rows instead of
    n * |q| scored pairs — the r6 bench's slowest-amortizing headline
    op was exactly that unbounded shuffle + per-pair interpreted HOF.
    """
    qid = query_id_column or id_column
    exclude_self = query_id_column is None
    q_rows = (
        queries.select(
            F.col(qid).alias("query_id"),
            as_double_array(F.col(vector_column), dim, "brute_force_topk queries")
            .alias("__qv"),
        )
        .limit(MAX_BRUTE_QUERIES + 1)
        .collect()
    )
    if len(q_rows) > MAX_BRUTE_QUERIES:
        raise ValueError(
            f"brute_force_topk: query set exceeds {MAX_BRUTE_QUERIES} rows; "
            "use lsh_topk(broadcast_queries=False) or the IVF paths "
            "(same flag) for large query sets")
    q_ids: list = []
    q_vecs: list = []
    for r in q_rows:
        if exclude_self and r["query_id"] is None:
            # NULL query id: `query_id != neighbor_id` is NULL for every
            # pair -> the filter drops them all
            continue
        q_ids.append(r["query_id"])
        q_vecs.append(r["__qv"])
    d = data.select(
        F.col(id_column).alias("neighbor_id"),
        as_double_array(F.col(vector_column), dim, "brute_force_topk data")
        .alias("__dv"),
    )
    return _arrow_topk(d, queries.schema[qid].dataType, q_ids, q_vecs,
                       k=k, round_digits=round_digits,
                       exclude_self=exclude_self, score_cells=score_cells)


def _arrow_topk(d: DataFrame, q_id_type, q_ids: list, q_vecs: list,
                *, k: int, round_digits: int | None, exclude_self: bool,
                q_buckets: list | None = None,
                score_cells: int = _SCORE_CELLS) -> DataFrame:
    """Shared bounded-shuffle exact-top-k engine behind
    :func:`brute_force_topk` and :func:`search_ivf_index`.

    ``d``: (neighbor_id, __dv array<double>[, __bkt]).  ``q_buckets``:
    per-query frozenset of bucket values — when given, a pair (q, row)
    exists only if ``row.__bkt in q_buckets[qi]`` (the IVF probed-list
    inner-join semantics); None = full cross pairing.

    Every emitted cosine is computed with DIM-ORDER float64
    accumulation — bit-identical to the ``F.aggregate`` HOF fold and
    the DuckDB oracle's left-to-right sum.  Each task emits only its
    local top candidates per query (tie window ``_topk_tie_cap``) plus
    <= k NULL-cosine fillers, so the final row_number window shuffles
    <= tasks * |q| * cap rows instead of every scored pair."""
    import numpy as np
    import pyarrow as pa

    bucketed = q_buckets is not None
    m = len(q_ids)
    # queries grouped by vector length: only equal-length pairs score
    # (zip_with pads mismatches with NULL -> NULL cosine); heterogeneous
    # lengths are permitted when no dim was enforced.  A query vector
    # CONTAINING a null element never scores (x * NULL poisons the whole
    # HOF fold -> NULL cosine): treat it like a NULL vector — all its
    # pairs are fillers.  (Genuine float NaN elements DO score: the fold
    # yields NaN and Spark's NaN total order ranks it first.)
    q_by_len: dict[int, list[int]] = {}
    for i, v in enumerate(q_vecs):
        if v is not None and not any(x is None for x in v):
            q_by_len.setdefault(len(v), []).append(i)
    q_mats = {
        L: (np.asarray([q_vecs[i] for i in idx], dtype=np.float64), idx)
        for L, idx in q_by_len.items()
    }
    # bucket value -> query indexes probing it (bucketed mode), and the
    # per-(bucket, length) query sub-matrices, built ONCE here — inside
    # the kernel this ran per batch with a per-element set() rebuild
    bucket_to_q: dict = {}
    bucket_plan: dict = {}
    if bucketed:
        for i, bs in enumerate(q_buckets):
            for b in bs or ():
                bucket_to_q.setdefault(b, []).append(i)
        for b, probers in bucket_to_q.items():
            ps = set(probers)
            groups = []
            for L, (qmat, qidx) in q_mats.items():
                sub = [j for j, qi in enumerate(qidx) if qi in ps]
                if sub:
                    groups.append((L, qmat[sub], [qidx[j] for j in sub]))
            bucket_plan[b] = groups
    # id -> ALL query indexes bearing it: a duplicated query id must
    # exclude its self-pair for EVERY instance (the filter semantics
    # `query_id != neighbor_id` hold per pair, not per first match)
    q_id_index: dict = {}
    if exclude_self:
        for _qi, _v in enumerate(q_ids):
            q_id_index.setdefault(_id_hashable(_v), set()).add(_qi)
    cap = _topk_tie_cap(k)
    id_field = d.schema["neighbor_id"]

    def _score_partition(batches):
        # per-query candidate stores, merged across this task's batches:
        # val_store: (micro_key desc, id asc) -> keep first `cap`
        # fill_store: NULL-cosine candidates (null vec / length mismatch /
        #   zero norm / null-vec query) -> k smallest ids fill ranks when
        #   a query has < k scorable neighbours inside its pair universe
        #   (HOF parity: NULLs sink under the final desc ordering)
        val_store = [[] for _ in range(m)]   # (micro, id_key, id, sim)
        fill_store = [[] for _ in range(m)]  # (id_key, id)
        # per-query prune threshold: the cap-th best micro key seen so
        # far in this task — once a query holds `cap` candidates, later
        # chunks skip anything strictly below it (a candidate with
        # micro < thr loses to >= cap stored entries, so it can never
        # reach the final top-cap; == thr must stay for the id
        # tie-break).  Without this, chunking multiplied candidate
        # appends by the chunk count (r8 boundary probe: 204 s at 16.7k
        # queries, append-bound, compute was ~2 s).
        thr = np.full(m, -np.inf)

        def _trim_one(qi):
            vs = val_store[qi]
            if len(vs) >= cap:
                vs.sort(key=lambda t: (-t[0], t[1]))
                del vs[cap:]
                thr[qi] = vs[-1][0]

        def _trim():
            for qi in range(m):
                _trim_one(qi)
                if len(fill_store[qi]) > k:
                    fill_store[qi].sort(key=lambda t: t[0])
                    del fill_store[qi][k:]

        def _score_group(rows, qmat, qidx, L, state):
            """Score data rows `rows` (length-L, valid) against query
            group (qmat, qidx), chunked so the rows x queries score
            matrix stays bounded: at the MAX_BRUTE_QUERIES boundary an
            unchunked (arrow_batch x |q|) float64 dot matrix is ~8 GB
            PER TASK (r8 boundary probe) — chunking bounds it to
            ~_SCORE_CELLS cells regardless of |q|.  Appends accumulate
            across chunks (the threshold prune only drops candidates
            already beaten by cap stored ones), so results are
            identical."""
            step = max(64, score_cells // max(1, len(qidx)))
            for s in range(0, len(rows), step):
                _score_chunk(rows[s:s + step], qmat, qidx, L, state)

        def _score_chunk(rows, qmat, qidx, L, state):
            """One bounded chunk of _score_group; records candidates +
            per-query scored masks into state."""
            ids_py, excl_rows, excl_count, per_q_scored, n, offs, flat = state
            dmat = flat[
                (offs[rows].astype(np.int64)[:, None]
                 + np.arange(L)[None, :]).ravel()
            ].reshape(len(rows), L)
            # dim-order accumulation: bit-identical to the HOF fold
            # ((0 + x0) + x1) + ... and the oracle's a1*b1 + a2*b2 + ..
            dot_m = np.zeros((len(rows), len(qidx)))
            nd = np.zeros(len(rows))
            nq = np.zeros(len(qidx))
            for di in range(L):
                dot_m += dmat[:, di:di + 1] * qmat[None, :, di]
                nd += dmat[:, di] * dmat[:, di]
                nq += qmat[:, di] * qmat[:, di]
            denom = np.sqrt(nq)[None, :] * np.sqrt(nd)[:, None]
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = dot_m / denom
            # HOF: when(denom > 0, dot/denom) — Spark's NaN total order
            # makes `NaN > 0` TRUE, so a NaN denom yields a NaN VALUE
            # (ranking FIRST under desc), never a NULL filler
            ok = (denom > 0) | np.isnan(denom)
            nan_sim = ok & np.isnan(sims)
            for ci, qi in enumerate(qidx):
                cand = np.nonzero(ok[:, ci])[0]
                if not len(cand):
                    continue
                sc = per_q_scored.get(qi)
                if sc is None:
                    sc = per_q_scored[qi] = np.zeros(n, dtype=bool)
                sc[rows[cand]] = True
                s = sims[cand, ci]
                # selection key: micro-rounded desc (the EXACT value
                # ships to Spark and is re-rounded there; the key only
                # picks the per-task window).  NaN ranks FIRST
                # (Spark/DuckDB total order: NaN > everything).
                if round_digits is not None:
                    micro = np.floor(s * 10.0**round_digits + 0.5)
                else:
                    micro = s.copy()
                micro = np.where(nan_sim[cand, ci], np.inf, micro)
                # running-threshold prune: once this query holds `cap`
                # stored candidates, anything strictly below the cap-th
                # micro key is already beaten and need not be appended
                # (== stays for the id tie-break).  This is what keeps
                # chunked scoring append-bound-free at large |q|.
                if thr[qi] != -np.inf:
                    keep_t = micro >= thr[qi]
                    if not keep_t.all():
                        cand, micro, s = cand[keep_t], micro[keep_t], \
                            s[keep_t]
                        if not len(cand):
                            continue
                if len(cand) > cap:
                    # exact selection: everything strictly above the
                    # cap-th micro key, plus the boundary ties resolved
                    # by ascending id.  A fixed 2*cap window silently
                    # broke the id tie-break when > 2*cap candidates tied
                    # at the boundary (constant / quantized / one-hot
                    # embeddings are realistic) — r7 ADVICE.
                    kth = micro[np.argpartition(-micro, cap - 1)[cap - 1]]
                    above = np.nonzero(micro > kth)[0]
                    ties = np.nonzero(micro == kth)[0]
                    need = cap - len(above) + excl_count.get(qi, 0)
                    if len(ties) > need:
                        import heapq
                        ties = heapq.nsmallest(
                            need, ties,
                            key=lambda p: _id_key(ids_py[rows[cand[p]]]))
                    part = np.concatenate(
                        [above, np.asarray(ties, dtype=np.int64)])
                else:
                    part = np.arange(len(cand))
                for pos in part:
                    i = rows[cand[pos]]
                    if qi in excl_rows.get(i, ()):
                        continue
                    val_store[qi].append(
                        (micro[pos], _id_key(ids_py[i]), ids_py[i],
                         float(s[pos])))
                # amortized trim keeps the store (and the threshold)
                # tight without sorting every chunk
                if len(val_store[qi]) >= 2 * cap:
                    _trim_one(qi)

        for batch in batches:
            ids_arr = batch.column(0)
            vec_arr = batch.column(1)
            n = len(ids_arr)
            if n == 0:
                continue
            ids_py = ids_arr.to_pylist()
            bkt_py = batch.column(2).to_pylist() if bucketed else None
            offs = vec_arr.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            flat = vec_arr.values.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False)
            row_valid = ~np.asarray(
                vec_arr.is_null().to_numpy(zero_copy_only=False))
            # a NULL ELEMENT poisons the HOF fold -> NULL cosine, but
            # to_numpy converts it to NaN — indistinguishable from a
            # genuine float NaN (which must SCORE, as NaN).  Mask rows
            # with null elements out of scoring so they sink as fillers,
            # exactly like the HOF/oracle path.
            elem_null = np.asarray(
                vec_arr.values.is_null().to_numpy(zero_copy_only=False))
            if elem_null.any():
                cs = np.concatenate(([0], np.cumsum(elem_null)))
                row_valid = row_valid & ((cs[offs[1:]] - cs[offs[:-1]]) == 0)
            lens = np.diff(offs)
            # with self-exclusion, NULL neighbor ids drop entirely
            # (`query_id != NULL` is NULL -> the filter removes the pair)
            excl_rows: dict[int, set] = {}
            keep = np.ones(n, dtype=bool)
            for i, rid in enumerate(ids_py):
                if exclude_self:
                    if rid is None:
                        keep[i] = False
                    else:
                        qis = q_id_index.get(_id_hashable(rid))
                        if qis is not None:
                            excl_rows[i] = qis
            per_q_scored: dict[int, "np.ndarray"] = {}
            # per-query count of self-excluded rows in THIS batch: the
            # boundary-tie selection widens by exactly this much so the
            # post-filter still holds the cap smallest surviving ids
            excl_count: dict[int, int] = {}
            for _qis in excl_rows.values():
                for _qi in _qis:
                    excl_count[_qi] = excl_count.get(_qi, 0) + 1
            state = (ids_py, excl_rows, excl_count, per_q_scored, n, offs,
                     flat)
            # in_universe[qi] = rows this query pairs with at all
            universe: dict[int, "np.ndarray"] = {}
            if bucketed:
                by_bucket: dict = {}
                for i in np.nonzero(keep)[0]:
                    b = bkt_py[i]
                    if b in bucket_to_q:
                        by_bucket.setdefault(b, []).append(i)
                for b, idxs in by_bucket.items():
                    idxs = np.asarray(idxs)
                    for qi in bucket_to_q[b]:
                        u = universe.get(qi)
                        if u is None:
                            u = universe[qi] = np.zeros(n, dtype=bool)
                        u[idxs] = True
                    # score this bucket's rows against the precomputed
                    # per-(bucket, length) query sub-matrices
                    for L, qmat_s, qidx_s in bucket_plan[b]:
                        if L == 0:
                            continue
                        rows = idxs[row_valid[idxs] & (lens[idxs] == L)]
                        if len(rows):
                            _score_group(rows, qmat_s, qidx_s, L, state)
            else:
                all_kept = keep
                for L, (qmat, qidx) in q_mats.items():
                    if L == 0:
                        continue  # empty vecs: norm 0 -> NULL (filler)
                    rows = np.nonzero(all_kept & row_valid & (lens == L))[0]
                    if len(rows):
                        _score_group(rows, qmat, qidx, L, state)
            # fillers: in-universe kept rows that produced NO value for a
            # query.  Vectorized: one id-order ranking per batch, then
            # per query an argpartition over its non-scoring rows — no
            # O(m*n) python walk when everything scores.
            kept_idx = np.nonzero(keep)[0]
            if not len(kept_idx):
                continue
            order_rank = None
            for qi in range(m):
                base = universe.get(qi) if bucketed else keep
                if base is None:
                    continue
                sc = per_q_scored.get(qi)
                ns = (base & ~sc) if sc is not None else base
                cand = np.nonzero(ns)[0]
                if not len(cand):
                    continue
                if order_rank is None:
                    order = sorted(kept_idx,
                                   key=lambda i: _id_key(ids_py[i]))
                    order_rank = np.empty(n, dtype=np.int64)
                    order_rank[np.asarray(order)] = np.arange(len(order))
                take = min(len(cand), k + len(excl_rows))
                if len(cand) > take:
                    sel = cand[np.argpartition(
                        order_rank[cand], take - 1)[:take]]
                else:
                    sel = cand
                got = 0
                for i in sorted(sel, key=lambda i: order_rank[i]):
                    if got >= k:
                        break
                    if qi in excl_rows.get(i, ()):
                        continue
                    fill_store[qi].append((_id_key(ids_py[i]), ids_py[i]))
                    got += 1
            _trim()

        _trim()
        out_ids_q, out_ids_n, out_sims = [], [], []
        for qi in range(m):
            val_store[qi].sort(key=lambda t: (-t[0], t[1]))
            for _key, _ik, rid, sim in val_store[qi][:cap]:
                out_ids_q.append(q_ids[qi])
                out_ids_n.append(rid)
                out_sims.append(sim)
            fill_store[qi].sort(key=lambda t: t[0])
            for _ik, rid in fill_store[qi][:k]:
                out_ids_q.append(q_ids[qi])
                out_ids_n.append(rid)
                out_sims.append(None)
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_ids_q, type=out_q_type),
             pa.array(out_ids_n, type=out_n_type),
             pa.array(out_sims, type=pa.float64())],
            names=["query_id", "neighbor_id", "cosine"])

    from pyspark.sql.pandas.types import to_arrow_type

    out_q_type = to_arrow_type(q_id_type)
    out_n_type = to_arrow_type(id_field.dataType)
    from pyspark.sql import types as T

    out_struct = T.StructType([
        T.StructField("query_id", q_id_type),
        T.StructField("neighbor_id", id_field.dataType),
        T.StructField("cosine", T.DoubleType()),
    ])
    scored = d.mapInArrow(_score_partition, schema=out_struct)
    sim = F.col("cosine")
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = scored.select("query_id", "neighbor_id", sim.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _id_hashable(v):
    """Dict-key form of an id (Row gives binary ids as unhashable
    bytearray)."""
    return bytes(v) if isinstance(v, (bytearray, memoryview)) else v


def _topk_tie_cap(k: int) -> int:
    """Per-(task, query) candidate emission cap: top-k selection inside
    the kernel uses micro-rounded keys, so candidates within one rounding
    unit of the k-th value can still win on the id tie-break after the
    EXACT Spark-side F.round — keep a generous window above k.  Exact
    whenever < cap candidates tie at the k-boundary per task (k=10 ->
    144 rows/query/task; adversarial all-equal corpora beyond that are
    ambiguous only below the id tie-break depth this cap keeps)."""
    return max(8 * k + 64, 2 * k)


def _id_key(v):
    """Ordering key for ids of any Spark id type: asc is NULLS FIRST,
    binary compares bytewise, and every other type (int, str, Decimal,
    date, timestamp) compares natively within its own type — a Spark
    column is type-uniform, so the raw value is the correct key (a
    str() fallback would sort Decimal '10' before '9')."""
    if v is None:
        return (-1, 0)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return (0, bytes(v))
    return (0, v)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG, no numpy RNG state).

    The 31-bit LCG draw divides by 2^30 so components span [-1, 1).
    (A 2^31 divisor confined every component to [-1, 0): all planes in
    one orthant, pairwise cosine ~0.7 — LSH buckets then collapse to
    the two all-same-sign buckets and the bucketed joins degenerate
    toward the full cross product the bucketing exists to prevent.)"""
    planes = []
    state = seed
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            v.append(((state >> 33) / float(1 << 30)) - 1.0)
        length = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / length for x in v])
    return planes


def lsh_bucket(vector: Column, planes: list[list[float]]) -> Column:
    """Sign-concatenation bucket id for random-hyperplane LSH."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(vector, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    data: DataFrame,
    queries: DataFrame,
    dim: int,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    round_digits: int | None = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    At scale the bucket column becomes the shuffle/partition key; each
    bucket's cross product is tiny (2^n_planes buckets).

    ``broadcast_queries=True`` (default) hints the query side into the
    build side of a broadcast join — right for the common small-query
    case (the data side never shuffles).  For query sets too large to
    broadcast (this is the escape path brute_force_topk's size error
    points at), pass ``False``: the join becomes a plain shuffle
    equi-join on ``bucket`` and AQE still picks broadcast at runtime
    when the query side turns out small.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    d = data.select(
        F.col(id_column).alias("neighbor_id"),
        as_double_array(F.col(vector_column), dim, "lsh_topk data")
        .alias("__dv"),
    ).withColumn("bucket", lsh_bucket(F.col("__dv"), planes))
    q = queries.select(
        F.col(id_column).alias("query_id"),
        as_double_array(F.col(vector_column), dim, "lsh_topk queries")
        .alias("__qv"),
    ).withColumn("bucket", lsh_bucket(F.col("__qv"), planes))
    sim = cosine(F.col("__qv"), F.col("__dv"), dim)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        d.join(F.broadcast(q) if broadcast_queries else q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, bucketed by
    LSH so only same-bucket pairs are compared (id_a < id_b)."""
    from geoparquet_io_spark.operators.skew import spread

    planes = _hyperplanes(dim, n_planes, seed)
    # per-pair HOF cosine dominates; gated scan-parallelism restore
    v = spread(df).select(
        F.col(id_column).alias("id"),
        as_double_array(F.col(vector_column)).alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                cosine(F.col("va"), F.col("vb"), dim).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# --- IVF (inverted-file) index ----------------------------------------------

def ivf_centroids(dim: int, n_centroids: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random centroids (LCG — data-independent so a
    SQL oracle can embed them as literals).  A production IVF would k-means
    them on a sample; the assignment/probe mechanics are identical."""
    return _hyperplanes(dim, n_centroids, seed)


def _nearest_centroid(vector: Column, centroids: list[list[float]]) -> Column:
    """argmin over squared L2 distance to each centroid (native exprs);
    deterministic tie-break on the lower centroid index (first minimum).

    Linear-size expression: distances land in one array and the argmin is
    ``array_position(d, array_min(d))``.  The previous chained
    when/otherwise accumulator DOUBLED the expression tree per centroid
    (the branch condition re-references the running best) — fine at 8
    centroids, OOM at 32."""
    dists = F.array(*[_sq_dist(vector, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _sq_dist(vector: Column, centroid: list[float]) -> Column:
    # HOF fold, NOT unrolled: centroid assignment evaluates once per ROW
    # (not per pair), and unrolling n_centroids * dim terms overflows the
    # codegen class-size limit (measured: 32x64 -> janino compile failure
    # + interpreted fallback).  Same float op order either way.
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vector, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _ivf_list_arrow(df: DataFrame, vector_column: str,
                    centroids: list[list[float]],
                    list_column: str) -> DataFrame:
    """Arrow-batched nearest-centroid list id appended to ``df`` — the
    kernel form of :func:`_nearest_centroid` (guide §4.2): centroids
    ride the task closure instead of embedding k x dim literals in the
    plan (32x64 doubles made every IVF plan a compile-heavy blob), and
    the per-row interpreted HOF folds become one numpy broadcast per
    batch.

    Bit-identical to the expression: squared distances accumulate in
    dim order (the same ``((0 + t0^2) + t1^2) + ...`` left fold),
    ``np.argmin`` takes the FIRST minimum like ``array_position(d,
    array_min(d))`` — including all-NaN rows, where numpy's first-index
    and Spark's NaN-equals-NaN position both yield index 0 — and a
    NULL vector or a vector containing NULL elements yields a NULL
    list id exactly as the NULL-propagating fold did."""
    import pandas as pd

    from pyspark.sql import types as T

    cents = [[float(x) for x in c] for c in centroids]
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(list_column, T.IntegerType())])
    vidx = df.columns.index(vector_column)

    def run(batches):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)       # (k, dim)
        dim = C.shape[1]
        for pdf in batches:
            m = len(pdf)
            cl = pd.array([None] * m, dtype="Int32")
            if m:
                vcol = pdf.iloc[:, vidx]
                mask = vcol.notna().to_numpy()
                if mask.any():
                    rowsv = vcol[mask].tolist()
                    try:
                        V = np.array(rowsv, dtype=np.float64)
                        ok = np.ones(len(rowsv), dtype=bool)
                    except (TypeError, ValueError):
                        # NULL elements inside a vector: that row's
                        # distances are all NULL under the fold
                        ok = np.array(
                            [all(e is not None for e in r)
                             for r in rowsv], dtype=bool)
                        V = np.array(
                            [r for r, o in zip(rowsv, ok) if o],
                            dtype=np.float64)
                    if len(V):
                        D = np.empty((len(V), len(C)), dtype=np.float64)
                        for k in range(len(C)):
                            acc = np.zeros(len(V), dtype=np.float64)
                            for d in range(dim):
                                t = V[:, d] - C[k, d]
                                acc += t * t
                            D[:, k] = acc
                        tgt = np.nonzero(mask)[0][ok]
                        cl[tgt] = np.argmin(D, axis=1).astype("int32")
            pdf[list_column] = cl
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _probe_lists_arrow(df: DataFrame, vector_column: str,
                       centroids: list[list[float]], nprobe: int,
                       probes_column: str) -> DataFrame:
    """Arrow-batched nprobe-nearest-list ids (ascending (distance,
    index)) appended as an int array — the kernel form of the
    ``array_sort(arrays_zip(dists, idx))`` probe expression, with the
    same tie-breaks: a stable argsort over the same left-fold
    distances reproduces (d asc, i asc), ranks NaN above every real
    (numpy sorts NaN last) and, for NULL vectors / NULL elements
    (all-NULL distances sort null-first tied on i), emits lists
    0..nprobe-1 exactly like the expression did."""
    import pandas as pd

    from pyspark.sql import types as T

    cents = [[float(x) for x in c] for c in centroids]
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(probes_column, T.ArrayType(T.IntegerType()))])
    vidx = df.columns.index(vector_column)

    def run(batches):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)
        dim = C.shape[1]
        null_probes = list(range(min(nprobe, len(cents))))
        for pdf in batches:
            m = len(pdf)
            probes = [list(null_probes)] * m
            if m:
                vcol = pdf.iloc[:, vidx]
                mask = vcol.notna().to_numpy()
                if mask.any():
                    rowsv = vcol[mask].tolist()
                    try:
                        V = np.array(rowsv, dtype=np.float64)
                        ok = np.ones(len(rowsv), dtype=bool)
                    except (TypeError, ValueError):
                        ok = np.array(
                            [all(e is not None for e in r)
                             for r in rowsv], dtype=bool)
                        V = np.array(
                            [r for r, o in zip(rowsv, ok) if o],
                            dtype=np.float64)
                    if len(V):
                        D = np.empty((len(V), len(C)), dtype=np.float64)
                        for k in range(len(C)):
                            acc = np.zeros(len(V), dtype=np.float64)
                            for d in range(dim):
                                t = V[:, d] - C[k, d]
                                acc += t * t
                            D[:, k] = acc
                        order = np.argsort(D, axis=1, kind="stable")
                        tgt = np.nonzero(mask)[0][ok]
                        for j, i in enumerate(tgt):
                            probes[i] = [int(x)
                                         for x in order[j, :nprobe]]
            pdf[probes_column] = pd.Series(probes, dtype="object")
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def ivf_assign(df: DataFrame, dim: int, n_centroids: int = 16,
               id_column: str = "vec_id", vector_column: str = "embedding",
               seed: int = 7, list_column: str = "ivf_list") -> DataFrame:
    """Assign every vector to its inverted list.  At scale this column is
    the partition key — `df.write.partitionBy(list_column)` gives physical
    locality so a probe reads only nprobe/n_centroids of the data."""
    cents = ivf_centroids(dim, n_centroids, seed)
    v = as_double_array(F.col(vector_column), dim, "ivf_assign")
    src = df.withColumn("__ivf_v", v)
    return _ivf_list_arrow(src, "__ivf_v", cents, list_column) \
        .drop("__ivf_v")


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    seed: int = 7,
    round_digits: int | None = 6,
    centroids: list[list[float]] | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: each query probes its ``nprobe`` nearest inverted
    lists; candidates meet only inside probed lists (bucket equi-join —
    the cross product never materializes).

    ``centroids`` overrides the deterministic LCG grid (this is how
    :func:`ivf_topk_trained` shares this body — ONE copy of the
    probe/score/window logic, so a tie-break or gate fix lands in both
    paths).  Vector lengths are enforced on BOTH sides: a ragged data
    vector previously NULL-ed every centroid distance and silently
    vanished from the equi-join; a ragged query returned NULL-cosine
    garbage from arbitrary lists.  ``broadcast_queries=False`` switches
    to a shuffle equi-join for query sets too large to broadcast (see
    :func:`lsh_topk`)."""
    cents = centroids if centroids is not None \
        else ivf_centroids(dim, n_centroids, seed)
    d = data.select(
        F.col(id_column).alias("neighbor_id"),
        as_double_array(F.col(vector_column), dim, "ivf_topk data")
        .alias("__dv"),
    )
    # Arrow kernels for the assignment and the probe ranking: centroids
    # travel in the closure, not as k x dim plan literals (§4.2 — the
    # literal blob made these plans compile-heavy and the HOF folds ran
    # interpreted per row)
    d = _ivf_list_arrow(d, "__dv", cents, "ivf_list")
    q = queries.select(
        F.col(id_column).alias("query_id"),
        as_double_array(F.col(vector_column), dim, "ivf_topk queries")
        .alias("__qv"),
    )
    # nprobe nearest lists per query, ascending (distance, index)
    q = _probe_lists_arrow(q, "__qv", cents, nprobe, "__probes") \
        .withColumn("ivf_list", F.explode("__probes")).drop("__probes")
    sim = cosine(F.col("__qv"), F.col("__dv"), dim)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        d.join(F.broadcast(q) if broadcast_queries else q, "ivf_list")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_train_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    vector_column: str = "embedding",
    sample_rows: int = 10_000,
    iterations: int = 5,
    seed: int = 7,
) -> list[list[float]]:
    """K-means (Lloyd) centroids trained on a driver-side sample —
    data-adapted inverted lists for better probe recall than the
    deterministic-random centroids.  Returns plain python lists so they
    embed in closures (and, at test scale, in generated SQL)."""
    import numpy as np

    total = df.count()
    s = df.select(as_double_array(F.col(vector_column)).alias("v"))
    if total > sample_rows:
        s = s.sample(fraction=min(1.0, sample_rows / total), seed=seed)
    x = np.array(s.toPandas()["v"].tolist(), dtype="f8")
    if len(x) < n_centroids:
        raise ValueError("sample smaller than n_centroids")
    # deterministic init: evenly spaced sample rows (sorted for stability)
    idx = np.linspace(0, len(x) - 1, n_centroids).astype(int)
    cents = x[idx].copy()
    for _ in range(iterations):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_column: str = "query_id",
    neighbor_column: str = "neighbor_id",
    round_digits: int = 4,
) -> DataFrame:
    """Recall@k of an approximate neighbor list against the exact one —
    the "measure, don't guess" primitive for tuning nprobe/band counts.

    Pure set arithmetic on (query, neighbor) pairs: hits = approx ∩
    exact per query, denominator = that query's exact-list size (so
    queries with fewer than k true neighbors aren't penalized).  Two
    small shuffles over result lists (k rows per query), never the
    corpus.
    """
    # distinct both sides: a fused/unioned candidate list with repeated
    # (query, neighbor) pairs would otherwise double-count hits (recall
    # above 1.0) or inflate the denominator — set arithmetic needs sets
    a = approx.select(F.col(query_column).alias("q"),
                      F.col(neighbor_column).alias("n")).distinct()
    e = exact.select(F.col(query_column).alias("q"),
                     F.col(neighbor_column).alias("n")).distinct()
    truth = e.groupBy("q").agg(F.count("*").alias("n_true"))
    hits = a.join(e, ["q", "n"]).groupBy("q").agg(F.count("*").alias("hits"))
    return (
        truth.join(hits, "q", "left")
        .select(
            F.col("q").alias(query_column),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            F.col("n_true"),
            F.round(F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_true"),
                    round_digits).alias("recall"),
        )
    )


def kmeans_fit_distributed(
    df: DataFrame,
    dim: int,
    n_centroids: int = 8,
    iterations: int = 2,
    vector_column: str = "embedding",
    seed: int = 7,
    round_digits: int = 6,
    init: list[list[float]] | None = None,
) -> list[list[float]]:
    """Full-data distributed Lloyd's k-means (the trainer behind IVF /
    SemDeDup when a driver-side sample isn't representative enough).

    Each iteration is ONE Spark job: Arrow-batched assignment (map-only,
    :func:`_assign_clusters_arrow`) followed by a ``k x dim`` partial
    aggregation — ``dim`` element sums per cluster, combined map-side,
    so the shuffle carries at most ``k`` rows PER PARTITION, never data
    rows.  Only the ``k x dim`` centroid matrix visits the driver
    between iterations (bounded state — the same loop shape MLlib's
    KMeans uses).  Empty clusters keep their previous centroid.

    Centroids are rounded to ``round_digits`` after every step so
    independent engines (the SQL oracles embed these iterations
    literally) reproduce the assignments exactly: given identical
    rounded centroids, per-row distances are bit-identical sequential
    folds, so only the (rounded) mean is engine-sensitive.

    Default ``init`` is the deterministic :func:`ivf_centroids` grid —
    data-independent, so two engines starting from the same seed agree.
    """
    if init is not None and len(init) != n_centroids:
        raise ValueError(
            f"init has {len(init)} centroids but n_centroids="
            f"{n_centroids}: a shorter init crashes mid-loop and a "
            "longer one silently drops clusters from the updates")
    cents = [[round(float(x), round_digits) for x in c]
             for c in (init or ivf_centroids(dim, n_centroids, seed))]
    # NULL and non-finite vectors contribute nothing to a mean (r10:
    # one NaN element made its cluster's sum — hence centroid — NaN,
    # and on the next assignment pass numpy's argmin returned the
    # first all-NaN distance index, collapsing EVERY vector into that
    # cluster).  r11: the exclusion moved INTO the Arrow kernel (a
    # rowwise np.isfinite mask there is ~free; the JVM F.exists scan
    # it replaces cost ~10% per iteration) — such rows come back with
    # cluster NULL and are dropped before the sums.
    src = df.select(F.lit(0).alias("id"),
                    as_double_array(F.col(vector_column), dim,
                                    "kmeans_fit_distributed").alias("v"))
    for _ in range(iterations):
        assigned = _assign_clusters_arrow(src, cents) \
            .filter(F.col("cluster").isNotNull())
        aggs = [F.count("*").alias("__cnt")] + [
            F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
            for i in range(dim)]
        rows = assigned.groupBy("cluster").agg(*aggs).collect()
        new = {int(r["cluster"]):
               [round(r[f"s{i}"] / r["__cnt"], round_digits)
                for i in range(dim)] for r in rows}
        cents = [new.get(j, cents[j]) for j in range(n_centroids)]
    return cents


def kmeans_model_table(
    spark,
    df: DataFrame,
    dim: int,
    n_centroids: int = 8,
    iterations: int = 2,
    vector_column: str = "embedding",
    seed: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Train :func:`kmeans_fit_distributed` and report the model as a
    scalar table: one row per (cluster, dimension) with the trained
    coordinate plus the cluster's final member count — the shape that
    persists to a model registry and that SQL engines can diff exactly.
    """
    cents = kmeans_fit_distributed(df, dim, n_centroids, iterations,
                                   vector_column, seed, round_digits)
    src = df.select(F.lit(0).alias("id"),
                    as_double_array(F.col(vector_column), dim,
                                    "kmeans_model_table").alias("v")) \
        .filter(F.col("v").isNotNull())
    sizes = {int(r["cluster"]): r["cnt"]
             for r in _assign_clusters_arrow(src, cents)
             .filter(F.col("cluster").isNotNull())
             .groupBy("cluster").agg(F.count("*").alias("cnt")).collect()}
    # empty clusters appear explicitly with size=0 (the docstring's
    # one-row-per-(cluster, dim) contract): a registry diff should see
    # "this cluster collapsed", not a missing-row schema surprise
    rows = [(j, int(sizes.get(j, 0)), d, float(cents[j][d]))
            for j in range(n_centroids) for d in range(dim)]
    return spark.createDataFrame(rows, "cluster int, size bigint, d int, coord double")


def ivf_topk_trained(
    data: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    round_digits: int | None = 6,
    centroids: list[list[float]] | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """ivf_topk with k-means-trained centroids (trains on ``data`` when
    ``centroids`` not given).  Delegates to :func:`ivf_topk` — the two
    paths previously carried duplicate probe/score/window bodies that
    had already drifted (only this one enforced data-side dim)."""
    if centroids is not None and not centroids:
        raise ValueError("centroids is empty — an invalid model; pass "
                         "None to train on the data")
    cents = (centroids if centroids is not None
             else ivf_train_centroids(data, dim, n_centroids, vector_column))
    return ivf_topk(data, queries, dim, k=k, nprobe=nprobe,
                    id_column=id_column, vector_column=vector_column,
                    round_digits=round_digits, centroids=cents,
                    broadcast_queries=broadcast_queries)


# --- PQ (product quantization) ----------------------------------------------

def pq_codebooks(dim: int, m: int, n_codes: int, seed: int = 11) -> list[list[list[float]]]:
    """Deterministic per-subvector codebooks (LCG — data-independent so a
    SQL oracle can embed them as literals, same trick as ivf_centroids).
    Production path: pq_train_codebooks."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return [_hyperplanes(sub, n_codes, seed + j) for j in range(m)]


def pq_encode(df: DataFrame, dim: int, m: int = 4, n_codes: int = 8,
              vector_column: str = "embedding", seed: int = 11,
              code_column: str = "pq_code",
              codebooks: list[list[list[float]]] | None = None) -> DataFrame:
    """Compress each vector to ``m`` one-byte codes (nearest codebook
    centroid per subvector) — 64 floats become 4-16 small ints, the 16-64x
    memory compression that makes billion-vector ANN fit a cluster.
    Assignment is pure native expressions (argmin over per-subvector
    squared L2), so encoding is map-only inside codegen: at 100 TB this
    is a single scan writing a narrow codes column."""
    cbs = codebooks or pq_codebooks(dim, m, n_codes, seed)
    sub = dim // m
    v = as_double_array(F.col(vector_column), dim, "pq_encode")
    codes = F.array(*[
        _nearest_centroid(F.slice(v, j * sub + 1, sub), cbs[j]) for j in range(m)
    ])
    return df.withColumn(code_column, codes)


def pq_train_codebooks(df: DataFrame, dim: int, m: int = 8, n_codes: int = 16,
                       vector_column: str = "embedding",
                       sample_rows: int = 10_000, iterations: int = 5,
                       seed: int = 11) -> list[list[list[float]]]:
    """Per-subvector Lloyd k-means on a driver-side sample (the standard
    PQ training procedure — Jegou et al. 2011, "Product Quantization for
    Nearest Neighbor Search")."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    total = df.count()
    s = df.select(as_double_array(F.col(vector_column)).alias("v"))
    if total > sample_rows:
        s = s.sample(fraction=min(1.0, sample_rows / total), seed=seed)
    x = np.array(s.toPandas()["v"].tolist(), dtype="f8")
    if len(x) < n_codes:
        raise ValueError("sample smaller than n_codes")
    books = []
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        idx = np.linspace(0, len(xs) - 1, n_codes).astype(int)
        cents = xs[idx].copy()
        for _ in range(iterations):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([list(map(float, c)) for c in cents])
    return books


def pq_topk_adc(data: DataFrame, queries: DataFrame, dim: int, m: int = 4,
                n_codes: int = 8, k: int = 10, id_column: str = "vec_id",
                vector_column: str = "embedding", seed: int = 11,
                round_digits: int | None = 6,
                codebooks: list[list[list[float]]] | None = None) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): data
    vectors are scanned as PQ codes; each query precomputes an m x n_codes
    lookup table of subvector distances, and a candidate's distance is m
    table lookups + adds instead of ``dim`` multiplies.

    Scale shape: the query side (with its LUT arrays) is BROADCAST; the
    data side streams through map-side as codes only — the exhaustive
    scan PQ compresses never shuffles.  Compose with ivf_assign to probe
    only nprobe lists (IVF-PQ) when even the compressed scan is too much.
    """
    cbs = codebooks or pq_codebooks(dim, m, n_codes, seed)
    sub = dim // m
    d = data.select(
        F.col(id_column).alias("neighbor_id"),
        as_double_array(F.col(vector_column), dim, "pq_topk_adc data")
        .alias("__dv"),
    )
    codes = F.array(*[
        _nearest_centroid(F.slice(F.col("__dv"), j * sub + 1, sub), cbs[j])
        for j in range(m)
    ])
    d = d.select("neighbor_id", codes.alias("codes"))
    # the crossJoin REQUIRES the broadcast (a shuffle cartesian is never
    # right); ADC's query side is LUTs-only and small by contract — for
    # huge query sets compose IVF first (ivf_pq_topk) so the join is an
    # equi-join on the probed list instead of a cross product
    q = queries.select(
        F.col(id_column).alias("query_id"),
        as_double_array(F.col(vector_column), dim, "pq_topk_adc queries")
        .alias("__qv"),
    )
    lut = F.array(*[
        F.array(*[
            _sq_dist(F.slice(F.col("__qv"), j * sub + 1, sub), cbs[j][c])
            for c in range(n_codes)
        ])
        for j in range(m)
    ])
    q = q.select("query_id", lut.alias("lut"))
    adc = F.aggregate(
        F.zip_with(F.col("lut"), F.col("codes"),
                   lambda l, c: F.element_at(l, c.cast("int") + 1)),
        F.lit(0.0), lambda a, b: a + b,
    )
    if round_digits is not None:
        adc = F.round(adc, round_digits)
    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_pq_topk(data: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                n_centroids: int = 16, nprobe: int = 4, m: int = 4,
                n_codes: int = 8, id_column: str = "vec_id",
                vector_column: str = "embedding", seed: int = 7,
                pq_seed: int = 11, round_digits: int | None = 6,
                centroids: list[list[float]] | None = None,
                codebooks: list[list[list[float]]] | None = None,
                broadcast_queries: bool = True) -> DataFrame:
    """IVF-PQ: the billion-vector ANN shape (Jegou et al. 2011) — each
    query probes its ``nprobe`` nearest inverted lists and ranks ONLY
    those lists' members, by ADC over PQ codes instead of full vectors.

    Combines the two independent compressions multiplicatively: IVF cuts
    candidates to ``nprobe/n_centroids`` of the corpus (bucket equi-join,
    no cross product), PQ cuts per-candidate cost to ``m`` table lookups
    and the scanned payload to ``m`` bytes per row.  At 100 TB the data
    side is a partitionBy(ivf_list) code table: the probe reads nprobe
    hive partitions of ~1/16th-compressed codes — everything else is
    never touched.  All map-only native expressions + one broadcast
    equi-join + the per-query top-k window over <= k * nprobe * list_len
    rows.
    """
    cents = centroids or ivf_centroids(dim, n_centroids, seed)
    cbs = codebooks or pq_codebooks(dim, m, n_codes, pq_seed)
    sub = dim // m
    d = data.select(
        F.col(id_column).alias("neighbor_id"),
        as_double_array(F.col(vector_column), dim, "ivf_pq_topk data")
        .alias("__dv"),
    )
    codes = F.array(*[
        _nearest_centroid(F.slice(F.col("__dv"), j * sub + 1, sub), cbs[j])
        for j in range(m)
    ])
    d = d.select("neighbor_id",
                 _nearest_centroid(F.col("__dv"), cents).alias("ivf_list"),
                 codes.alias("codes"))
    q = queries.select(
        F.col(id_column).alias("query_id"),
        as_double_array(F.col(vector_column), dim, "ivf_pq_topk queries")
        .alias("__qv"),
    )
    dists = F.array(*[_sq_dist(F.col("__qv"), c) for c in cents])
    idx = F.sequence(F.lit(0), F.lit(len(cents) - 1))
    probed = F.slice(F.array_sort(F.arrays_zip(dists.alias("d"),
                                               idx.alias("i"))), 1, nprobe)
    lut = F.array(*[
        F.array(*[
            _sq_dist(F.slice(F.col("__qv"), j * sub + 1, sub), cbs[j][c])
            for c in range(n_codes)
        ])
        for j in range(m)
    ])
    q = q.select(
        "query_id", lut.alias("lut"),
        F.explode(F.transform(probed, lambda s: s["i"])).alias("ivf_list"))
    adc = F.aggregate(
        F.zip_with(F.col("lut"), F.col("codes"),
                   lambda l, c: F.element_at(l, c.cast("int") + 1)),
        F.lit(0.0), lambda a, b: a + b,
    )
    if round_digits is not None:
        adc = F.round(adc, round_digits)
    scored = (
        d.join(F.broadcast(q) if broadcast_queries else q, "ivf_list")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"),
                                               F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _assign_clusters_arrow(src: DataFrame,
                           centroids: list[list[float]]) -> DataFrame:
    """Arrow-batched centroid assignment + norm: (id, v) -> (id, v,
    cluster, n).  Replaces the per-row HOF fold (32 centroids x 64 dims
    of interpreted lambda per row) with one numpy pass per batch.

    Bit-identical to the HOF kernel: squared distances accumulate in
    dim order (``((0 + t0^2) + t1^2) + ...`` — the same left fold as
    ``F.aggregate``), products/subtractions are the same float64 ops,
    and ``np.argmin`` takes the FIRST minimum exactly like
    ``array_position(d, array_min(d))``.

    NULL vectors get cluster NULL / n NULL (``np.stack`` over a batch
    containing ``None`` used to die with an opaque shape error deep in
    an executor), and so do NON-FINITE vectors (r11: the rowwise
    np.isfinite mask is ~free here, where a separate JVM
    ``F.exists(... isnan ...)`` pre-filter cost kmeans ~10% per
    iteration); callers route NULL-cluster rows around the scorers —
    a row with no usable embedding can neither lose nor witness.
    """
    import pandas as pd

    from pyspark.sql import types as T

    cents = [[float(x) for x in c] for c in centroids]
    dim = len(cents[0])
    schema = T.StructType([
        T.StructField("id", src.schema["id"].dataType),
        T.StructField("v", T.ArrayType(T.DoubleType())),
        T.StructField("cluster", T.IntegerType()),
        T.StructField("n", T.DoubleType()),
    ])

    def assign(batches):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)        # (k, dim)
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            mask = pdf["v"].notna().to_numpy()
            cluster = pd.array([None] * m, dtype="Int32")
            nn = pd.array([None] * m, dtype="Float64")
            if mask.any():
                V0 = np.stack(pdf["v"][mask].to_numpy())  # (mv0, dim)
                finite = np.isfinite(V0).all(axis=1)
                if finite.all():
                    V = V0        # no copy on the all-finite fast path
                else:
                    mask[np.nonzero(mask)[0][~finite]] = False
                    if not mask.any():
                        yield pd.DataFrame({"id": pdf["id"], "v": pdf["v"],
                                            "cluster": cluster, "n": nn})
                        continue
                    V = V0[finite]
                mv = V.shape[0]
                D = np.empty((mv, len(C)), dtype=np.float64)
                for k in range(len(C)):
                    acc = np.zeros(mv, dtype=np.float64)
                    for d in range(dim):
                        t = V[:, d] - C[k, d]
                        acc += t * t
                    D[:, k] = acc
                acc = np.zeros(mv, dtype=np.float64)
                for d in range(dim):
                    acc += V[:, d] * V[:, d]
                cluster[mask] = np.argmin(D, axis=1).astype("int32")
                nn[mask] = np.sqrt(acc)
            yield pd.DataFrame({
                "id": pdf["id"],
                "v": pdf["v"],
                "cluster": cluster,
                "n": nn,
            })

    return src.mapInPandas(assign, schema)


def _cluster_losers_arrow(pool: DataFrame, threshold: float,
                          block: int = 2048) -> DataFrame:
    """Intra-cluster all-pairs scorer as an Arrow cogroup kernel: for
    each cluster, return the ids that lose to a LOWER-id near-duplicate
    (cosine >= threshold).

    The gram matrix is computed blockwise (``block`` columns at a time,
    so peak memory is ``m * block`` doubles per task, never ``m^2``)
    with dim-order accumulation — the identical left-fold float64 op
    sequence as the HOF ``dot``/``norm`` expressions, so results match
    the native-expression path bit for bit.  Undefined cosines (a
    zero-norm vector: 0/0 = NaN) compare IEEE-false against the
    threshold — the same semantics as the SQL oracles (Spark's
    NaN-largest ordering quirk is deliberately NOT reproduced).

    One shuffle on the cluster id; a cluster must fit one task
    (guaranteed by semantic_dedup's ``max_cluster_size`` routing).
    """
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("id", pool.schema["id"].dataType)])

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        m = len(pdf)
        if m < 2:
            return pdf.iloc[0:0][["id"]]
        V = np.stack(pdf["v"].to_numpy())               # (m, dim) float64
        n = pdf["n"].to_numpy(dtype=np.float64)
        dim = V.shape[1]
        lost = np.zeros(m, dtype=bool)
        rows_idx = np.arange(m)
        with np.errstate(divide="ignore", invalid="ignore"):
            for j0 in range(0, m, block):
                j1 = min(j0 + block, m)
                G = np.zeros((m, j1 - j0), dtype=np.float64)
                for d in range(dim):
                    G += V[:, d][:, None] * V[j0:j1, d][None, :]
                S = G / (n[:, None] * n[j0:j1][None, :])
                hit = S >= threshold
                pred = rows_idx[:, None] < (j0 + np.arange(j1 - j0))[None, :]
                lost[j0:j1] |= (hit & pred).any(axis=0)
        return pdf.loc[lost, ["id"]]

    return pool.groupBy("cluster").applyInPandas(score, out_schema)


def _chain_band_pairs(rows: DataFrame, window: int) -> DataFrame:
    """Bounded predecessor pairing for OVERSIZE clusters: rows ranked by
    id within their cluster; each row pairs only with its ``window``
    immediate predecessors.  The join is banded (chunk = rank div
    window; a qualifying pair is always in the same or adjacent chunk),
    so generated pair volume is <= 2*window per row — LINEAR in cluster
    size, never the n^2 equi-join.

    Exactness property: in a mass of MUTUAL near-duplicates every
    id-order predecessor is itself a duplicate, so each row except the
    cluster-minimum finds a witness — identical kept-set to the
    all-pairs rule for the dup-heavy case the cap exists for.  Sparse
    pairs more than ``window`` apart in id order with no intermediate
    duplicates are the (documented) approximation.

    Input ``rows``: (id, v, n, cluster).  Output: (id_a, id_b) with
    id_a < id_b, rank distance <= window.

    NULLS LAST, matching pandas ``sort_values`` in the all-pairs scorer
    (Spark's default asc puts NULLs FIRST): a NULL-id row must get the
    same survivor semantics — it loses to any witness — whichever path
    its cluster size routes it through.
    """
    wnd = Window.partitionBy("cluster").orderBy(F.col("id").asc_nulls_last())
    r = rows.withColumn("__rk", F.row_number().over(wnd)) \
        .withColumn("__ck", ((F.col("__rk") - 1) / window).cast("long"))
    # predecessor side advertises itself to its own and the NEXT chunk
    a = r.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("n").alias("na"), "cluster",
        F.col("__rk").alias("__rka"),
        F.explode(F.array(F.col("__ck"), F.col("__ck") + 1)).alias("__jk"))
    b = r.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("n").alias("nb"), "cluster",
        F.col("__rk").alias("__rkb"), F.col("__ck").alias("__jk"))
    return (
        a.join(b, ["cluster", "__jk"])
        .filter((F.col("__rkb") > F.col("__rka"))
                & (F.col("__rkb") - F.col("__rka") <= window))
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    threshold: float = 0.95,
    max_cluster_size: int | None = 10_000,
    window: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (public method: Abbas et al.
    2023, arXiv:2303.09540): partition the embedding space with k-means
    clusters, then drop near-duplicates WITHIN each cluster — pairwise
    cosine is only ever computed between same-cluster rows, so the
    all-pairs product never materializes (one shuffle on the cluster
    id, the same 100 TB shape as the LSH/IVF paths).  Assignment and
    intra-cluster scoring run as Arrow-batched numpy kernels with the
    identical float64 op order as the native HOF expressions
    (:func:`_assign_clusters_arrow`, :func:`_cluster_losers_arrow`) —
    dense O(pairs x dim) arithmetic is exactly where vectorized batch
    UDFs beat interpreted per-element lambdas.

    Keeps the lowest id of every duplicate pair (the standard
    deterministic survivor rule).  Returns every input row with its
    ``cluster`` and a ``kept`` flag.

    Skew guard: with fixed centroids a near-dup-heavy corpus can
    concentrate mass in one cluster, making the intra-cluster equi-join
    quadratic in THAT cluster.  Clusters above ``max_cluster_size``
    therefore switch to the banded predecessor chain
    (:func:`_chain_band_pairs`): pair volume <= 2*``window`` per row —
    linear — and the kept-set is identical for mutual-duplicate masses
    (each row's id-order predecessor is its witness).  Pairs >
    ``window`` apart in id order with no intermediate duplicate are the
    approximation this trades (SemDeDup already trades cross-cluster
    pairs).  ``max_cluster_size=None`` restores unconditional all-pairs.

    At scale: the cluster id doubles as a partition key
    (``write.partitionBy``); with the cap, worst-case pair volume is
    ``max(max_cluster_size^2, n*2*window)`` regardless of skew.
    """
    from geoparquet_io_spark.operators.skew import spread

    # assignment + norm run as ONE Arrow pass (the interpreted HOF fold
    # was the measured bottleneck: 32 centroids x 64 dims of lambda per
    # row, then 64 more per pair); spread() fixes single-row-group scans
    # (no-op on real lakes) so batches decode in parallel
    dim = len(centroids[0])
    src = spread(df).select(
        F.col(id_column).alias("id"),
        as_double_array(F.col(vector_column), dim, "semantic_dedup")
        .alias("v"))
    v = _assign_clusters_arrow(src, centroids)
    # the assigned table feeds the counts split, the scorer, and the
    # final join; without materialization the assignment would run 3x
    # (same guard connected_components uses for its iteration state)
    v = v.localCheckpoint(eager=False)
    losers = _intra_cluster_losers(v, dim, threshold, max_cluster_size,
                                   window).distinct()
    return (
        v.join(losers.withColumn("__lost", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_column),
            F.col("cluster").cast("int").alias("cluster"),
            F.coalesce(~F.col("__lost"), F.lit(True)).alias("kept"),
        )
    )


def _intra_cluster_losers(v: DataFrame, dim: int, threshold: float,
                          max_cluster_size: int | None,
                          window: int) -> DataFrame:
    """Same-set loser ids for an assigned (id, v, n, cluster) table:
    clusters at or under ``max_cluster_size`` run the Arrow all-pairs
    scorer; larger ones the banded predecessor chain.  Shared by
    :func:`semantic_dedup` and :func:`semantic_dedup_incremental`
    (NOT distinct — callers dedup as they combine sources).

    NULL-embedding rows carry cluster NULL from the assign kernel; they
    can neither lose nor witness, so they are excluded here BEFORE the
    groupBy (Spark groups NULL keys together — the scorer's np.stack
    would otherwise see a batch of None vectors).

    r12: cluster sizes come from a WINDOW count over the cluster key
    instead of the former agg + broadcast join — the window's single
    exchange establishes exactly the clustering every downstream
    consumer needs (the Arrow scorer's groupBy and the chain's window
    reuse it with no further shuffle), so the count is free where the
    agg + broadcast cost one extra shuffle + one broadcast build.  No
    new skew cliff: both branches already required a whole cluster in
    one task (applyInPandas group / row_number window)."""
    v = v.filter(F.col("cluster").isNotNull())
    if max_cluster_size is None:
        return _cluster_losers_arrow(v, threshold)
    wc = Window.partitionBy("cluster")
    vv = v.withColumn("__cn", F.count(F.lit(1)).over(wc))
    pool = vv.filter(F.col("__cn") <= max_cluster_size).drop("__cn")
    big = vv.filter(F.col("__cn") > max_cluster_size).drop("__cn")
    # NULL (never an ANSI DIVIDE_BY_ZERO) for zero-norm members, like
    # cosine() and the Arrow kernel; NULL >= threshold is false -> kept
    denom = F.col("na") * F.col("nb")
    sim = F.when(denom > 0, dot(F.col("va"), F.col("vb"), dim) / denom)
    big_pairs = _chain_band_pairs(big, window).filter(sim >= threshold) \
        .select(F.col("id_b").alias("id"))
    return _cluster_losers_arrow(pool, threshold).unionByName(big_pairs)


def _cross_losers_arrow(new_pool: DataFrame, idx_pool: DataFrame,
                        threshold: float, block: int = 2048,
                        max_group: int | None = None) -> DataFrame:
    """Cross-set near-dup scorer (Arrow cogroup kernel): for each
    cluster, return NEW ids whose cosine against ANY index member is
    >= threshold.  Same blockwise gram matrix and dim-order float64
    accumulation as :func:`_cluster_losers_arrow` (bit-identical to the
    SQL cosine), but no ordering rule — every index member is a kept
    survivor, so any hit kills the new row.

    ``max_group`` bounds PER-TASK memory on hot clusters: each side is
    cut into id-ordered sub-blocks of at most that many rows and the
    cogroup key becomes (cluster, new_block, idx_block) — every
    new-index pair still meets in exactly ONE task (the blocked cross
    product is exact), but no task ever materializes more than
    ~2*max_group rows.  Replication factor is the other side's block
    count; the per-cluster block-count tables are bounded by
    len(centroids) rows, so both are broadcast joins."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("id", new_pool.schema["id"].dataType)])

    if max_group is not None:
        wc = Window.partitionBy("cluster").orderBy("id")
        new_r = new_pool.withColumn(
            "__bn", ((F.row_number().over(wc) - 1) / max_group)
            .cast("long"))
        idx_r = idx_pool.withColumn(
            "__bi", ((F.row_number().over(wc) - 1) / max_group)
            .cast("long"))
        n_bi = idx_r.groupBy("cluster").agg(
            (F.max("__bi") + 1).alias("__nbi"))
        n_bn = new_r.groupBy("cluster").agg(
            (F.max("__bn") + 1).alias("__nbn"))
        # inner joins: a cluster absent from the other side has no
        # cross pairs and drops out entirely
        new_g = (new_r.join(F.broadcast(n_bi), "cluster")
                 .withColumn("__bi", F.explode(F.sequence(
                     F.lit(0).cast("long"), F.col("__nbi") - 1))))
        idx_g = (idx_r.join(F.broadcast(n_bn), "cluster")
                 .withColumn("__bn", F.explode(F.sequence(
                     F.lit(0).cast("long"), F.col("__nbn") - 1))))
        keys = ["cluster", "__bn", "__bi"]
    else:
        new_g, idx_g, keys = new_pool, idx_pool, ["cluster"]

    def score(key, new_pdf: pd.DataFrame, idx_pdf: pd.DataFrame):
        import numpy as np

        if new_pdf.empty or idx_pdf.empty:
            return new_pdf.iloc[0:0][["id"]]
        Vn = np.stack(new_pdf["v"].to_numpy())          # (m, dim)
        nn = new_pdf["n"].to_numpy(dtype=np.float64)
        Vi = np.stack(idx_pdf["v"].to_numpy())          # (p, dim)
        ni = idx_pdf["n"].to_numpy(dtype=np.float64)
        dim = Vn.shape[1]
        m = len(new_pdf)
        lost = np.zeros(m, dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            for j0 in range(0, len(idx_pdf), block):
                j1 = min(j0 + block, len(idx_pdf))
                G = np.zeros((m, j1 - j0), dtype=np.float64)
                for d in range(dim):
                    G += Vn[:, d][:, None] * Vi[j0:j1, d][None, :]
                S = G / (nn[:, None] * ni[j0:j1][None, :])
                lost |= (S >= threshold).any(axis=1)
        return new_pdf.loc[lost, ["id"]]

    return (new_g.groupBy(*keys)
            .cogroup(idx_g.groupBy(*keys))
            .applyInPandas(score, out_schema)
            .distinct())


def semantic_dedup_incremental(
    new_df: DataFrame,
    index_df: DataFrame,
    centroids: list[list[float]],
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    threshold: float = 0.95,
    max_cluster_size: int | None = 10_000,
    window: int = 64,
) -> DataFrame:
    """Incremental SemDeDup — the daily-ingest shape: dedup TODAY's
    batch against YESTERDAY's persisted kept-set WITHOUT recomputing the
    corpus (the same build-once/search-many economics as the persisted
    IVF index and the LSH band index ``dedup_against_index``).

    ``index_df`` is the persisted survivors table (``id_column`` +
    ``vector_column``; the partitionBy(cluster) layout
    ``semantic_dedup`` recommends reads straight back into this shape).
    Index vectors are re-assigned with the SAME ``centroids`` —
    assignment is deterministic, so a persisted ``cluster`` column and
    a recomputed one agree; passing centroids other than the ones the
    index was built with silently degrades recall, same as probing an
    IVF index with foreign centroids.

    A new row is dropped when it has a cosine >= ``threshold`` witness
    EITHER in the index (any member — the index is already deduped, so
    no ordering rule applies) OR at a smaller id within its own batch
    (the standard intra-batch survivor rule, hot clusters routed
    through the banded chain exactly like :func:`semantic_dedup`).

    Returns every NEW row with ``cluster`` and ``kept`` — union the
    kept rows into the index to absorb the batch; re-ingesting an
    absorbed batch then keeps nothing new (idempotent replay, tested).
    """
    from geoparquet_io_spark.operators.skew import spread

    dim = len(centroids[0])
    new_src = spread(new_df).select(
        F.col(id_column).alias("id"),
        as_double_array(F.col(vector_column), dim,
                        "semantic_dedup_incremental new").alias("v"))
    v_new = _assign_clusters_arrow(new_src, centroids) \
        .localCheckpoint(eager=False)
    idx_src = spread(index_df).select(
        F.col(id_column).alias("id"),
        as_double_array(F.col(vector_column), dim,
                        "semantic_dedup_incremental index").alias("v"))
    v_idx = _assign_clusters_arrow(idx_src, centroids)

    # intra-batch losers: identical routing to semantic_dedup
    intra = _intra_cluster_losers(v_new, dim, threshold, max_cluster_size,
                                  window).distinct() \
        .localCheckpoint(eager=False)
    # cross losers vs the persisted kept-set — checked only for the
    # INTRA-BATCH SURVIVORS (a row already dropped by a smaller batch
    # id needs no index witness; the final kept-set is identical), so a
    # boilerplate mass collapses to its survivors before the cross
    # check.  max_group sub-blocks both cogroup sides so no task ever
    # materializes a hot cluster whole.
    # NULL-embedding rows (cluster NULL from the assign kernel) are
    # kept unconditionally: they can neither lose nor witness, and the
    # cross cogroup would group both sides' NULL clusters together
    survivors = v_new.join(intra, "id", "left_anti") \
        .filter(F.col("cluster").isNotNull())
    # no outer .distinct(): intra is already distinct, the cross set is
    # distinct by construction, and the anti-join makes them disjoint —
    # the extra full shuffle bought nothing on every daily-ingest run
    losers = intra.unionByName(
        _cross_losers_arrow(survivors, v_idx.filter(
            F.col("cluster").isNotNull()), threshold,
            max_group=max_cluster_size))
    return (
        v_new.join(losers.withColumn("__lost", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_column),
            F.col("cluster").cast("int").alias("cluster"),
            F.coalesce(~F.col("__lost"), F.lit(True)).alias("kept"),
        )
    )


def quantize_embeddings_int8(
    df: DataFrame,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    code_column: str = "codes",
    scale_column: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4x
    storage/bandwidth cut for embedding lakes (public practice in FAISS
    SQ8 / vector-DB storage tiers).

    ``scale = max(|v|)/127`` (1.0 for the all-zero vector);
    ``code_i = floor(v_i/scale + 0.5)`` — explicit floor(+0.5) rounding
    so the arithmetic is engine-exact (SQL ROUND ties differ between
    engines; floor does not).  |code_i| <= 127 holds mathematically, no
    clamp needed.  Reconstruction error |v_i - code_i*scale| <= scale/2.

    Map-only native expressions; at 100 TB this runs in the ingest pass
    and downstream ANN reads 1/4 the bytes.
    """
    v = as_double_array(F.col(vector_column))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
    codes = F.transform(v, lambda x: F.floor(x / F.col(scale_column) + F.lit(0.5))
                        .cast("int"))
    out = df.withColumn(scale_column, scale)
    return out.withColumn(code_column, codes)


def dequantize_embeddings_int8(
    df: DataFrame,
    code_column: str = "codes",
    scale_column: str = "scale",
    vector_column: str = "embedding_approx",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings_int8` (approximate)."""
    return df.withColumn(
        vector_column,
        F.transform(F.col(code_column),
                    lambda c: c.cast("double") * F.col(scale_column)),
    )


# ---------------------------------------------------------------------------
# persisted IVF index (build once, search many — the daily-ingest shape)
# ---------------------------------------------------------------------------

IVF_INDEX_META = "ivf_index.json"


def build_ivf_index(spark, df: DataFrame, path: str, dim: int,
                    n_centroids: int = 16, id_column: str = "vec_id",
                    vector_column: str = "embedding", seed: int = 7,
                    centroids: list[list[float]] | None = None) -> dict:
    """Persist an IVF index: vectors written ``partitionBy(ivf_list)``
    (physical locality — a probe reads only the hive partitions of its
    probed lists, so partition pruning skips (n_centroids - nprobe)/
    n_centroids of the files before any row is touched) plus a JSON
    sidecar holding the centroids and parameters.  Pass ``centroids``
    from :func:`ivf_train_centroids` for data-adapted lists; default is
    the deterministic-LCG layout (oracle-parity path).

    This is the production separation the in-memory ``ivf_topk`` can't
    give: build ONCE at ingest (one assignment scan + one partitioned
    write), then every search session is metadata + nprobe partitions.
    """
    import json
    import os
    import uuid
    from urllib.parse import urlparse

    from pyspark.sql import Observation

    if urlparse(path).scheme not in ("", "file"):
        raise NotImplementedError(
            "build_ivf_index writes its JSON sidecar with local-fs APIs; "
            f"non-local index path {path!r} is not supported — build to "
            "a local path and upload the directory")
    cents = centroids if centroids is not None \
        else ivf_centroids(dim, n_centroids, seed)
    # ragged vectors raise loudly; NULL and NON-FINITE vectors are
    # unsearchable and excluded — the assignment kernel gives both
    # cluster NULL, and without the ivf_list filter below they would
    # land in __HIVE_DEFAULT_PARTITION__ and never be probed, silently
    # inflating n_vectors
    src = df.select(F.col(id_column).alias("id"),
                    as_double_array(F.col(vector_column), dim,
                                    "build_ivf_index").alias("v")) \
        .filter(F.col("v").isNotNull())
    assigned = _assign_clusters_arrow(src, cents).select(
        F.col("id").alias("vec_id"), F.col("v").alias("vector"),
        F.col("cluster").alias("ivf_list")) \
        .filter(F.col("ivf_list").isNotNull())
    # row count rides the write job as an observed metric — no separate
    # count job re-reading what was just written
    obs = Observation()
    assigned = assigned.observe(obs, F.count(F.lit(1)).alias("n"))
    vdir = os.path.join(path, "vectors")
    assigned.write.partitionBy("ivf_list").mode("overwrite").parquet(vdir)
    n = obs.get["n"]
    # build token ties sidecar to THIS vector write: a rebuild that
    # crashes between the parquet overwrite and the sidecar swap would
    # otherwise leave OLD centroids silently describing NEW partitions
    # (low-recall answers with no error) — load_ivf_index verifies it
    token = uuid.uuid4().hex
    with open(os.path.join(vdir, "_BUILD_TOKEN"), "w") as fh:
        fh.write(token)
    meta = {
        "dim": int(dim),
        "n_centroids": len(cents),
        "metric": "cosine",
        "id_column": id_column,
        "vector_column": vector_column,
        "centroids": [[float(x) for x in c] for c in cents],
        "n_vectors": int(n),
        "build_token": token,
    }
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, IVF_INDEX_META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, IVF_INDEX_META))
    return meta


def load_ivf_index(spark, path: str) -> tuple[DataFrame, dict]:
    """(vectors DataFrame with ``ivf_list`` partition column, meta dict)."""
    import json
    import os

    with open(os.path.join(path, IVF_INDEX_META)) as fh:
        meta = json.load(fh)
    vdir = os.path.join(path, "vectors")
    tok_file = os.path.join(vdir, "_BUILD_TOKEN")
    expect = meta.get("build_token")
    if expect is not None:
        try:
            with open(tok_file) as fh:
                actual = fh.read().strip()
        except OSError:
            actual = None
        if actual != expect:
            raise ValueError(
                f"IVF index at {path!r} is from an interrupted build "
                "(sidecar and vectors disagree) — rebuild it")
    return spark.read.parquet(vdir), meta


def search_ivf_index(spark, path: str, queries: DataFrame, k: int = 10,
                     nprobe: int = 4, id_column: str = "vec_id",
                     vector_column: str = "embedding",
                     round_digits: int | None = 6) -> DataFrame:
    """Top-k cosine search against a persisted IVF index.  The union of
    probed list ids (<= n_centroids values) is collected driver-side and
    pushed into the scan as a partition filter, so only the probed hive
    partitions' FILES are read; candidates then score inside the shared
    Arrow top-k kernel (:func:`_arrow_topk`) with the probed-list sets
    as pair gates — bit-identical values to the ``ivf_topk`` HOF oracle,
    but per-task bounded emission instead of shuffling every scored
    pair (the r7 100x curve showed the equi-join + full window shape
    going super-linear: 813 -> 1594 us/row at 200k vectors)."""
    data, meta = load_ivf_index(spark, path)
    cents = meta["centroids"]
    q = queries.select(
        F.col(id_column).alias("query_id"),
        as_double_array(F.col(vector_column), int(meta["dim"]),
                        "search_ivf_index queries").alias("__qv"),
    )
    # the queries are collected to the driver anyway (they parameterize
    # the Arrow top-k kernel), so the probed-list ranking runs in
    # driver-side numpy on the collected vectors instead of embedding
    # k x dim centroid literals in the plan (r12's "huge-literal plans"
    # item: the blob dominated first-run analysis+codegen).  Arithmetic
    # is the expression's exactly: same per-dim left fold, stable
    # argsort == (dist asc, index asc) with NaN ranked above every
    # real; NULL vectors / NULL elements probe lists 0..nprobe-1 like
    # the all-NULL-distance sort did.  Duplicate query rows remain
    # distinct instances exactly as the old explode+join did.
    rows = q.limit(MAX_BRUTE_QUERIES + 1).collect()
    if len(rows) > MAX_BRUTE_QUERIES:
        raise ValueError(
            f"search_ivf_index: query set exceeds {MAX_BRUTE_QUERIES} rows; "
            "split the query batch")
    import numpy as np

    C = np.asarray([[float(x) for x in c] for c in cents],
                   dtype=np.float64)
    null_probes = list(range(min(nprobe, len(cents))))

    def _probe(v) -> list:
        if v is None or any(e is None for e in v):
            return list(null_probes)
        x = np.asarray(v, dtype=np.float64)
        dists = np.empty(len(C), dtype=np.float64)
        for kk in range(len(C)):
            acc = 0.0
            for dd in range(C.shape[1]):
                t = x[dd] - C[kk, dd]
                acc += t * t
            dists[kk] = acc
        return [int(i) for i in
                np.argsort(dists, kind="stable")[:nprobe]]

    q_ids: list = []
    q_vecs: list = []
    q_buckets: list = []
    for r in rows:
        if r["query_id"] is None:
            # NULL id: the self-exclusion filter drops every pair
            continue
        q_ids.append(r["query_id"])
        q_vecs.append(r["__qv"])
        q_buckets.append(frozenset(_probe(r["__qv"])))
    lists = sorted({b for bs in q_buckets for b in bs if b is not None})
    # partition pruning: only the probed hive partitions' files are read
    pruned = data.filter(F.col("ivf_list").isin(lists))
    d = pruned.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array(F.col("vector")).alias("__dv"),
        F.col("ivf_list").alias("__bkt"),
    )
    return _arrow_topk(d, queries.schema[id_column].dataType, q_ids, q_vecs,
                       k=k, round_digits=round_digits, exclude_self=True,
                       q_buckets=q_buckets)


def rrf_fuse(rankings: list, id_column: str, rank_column: str = "rank",
             k: int = 60, round_digits: int = 6) -> DataFrame:
    """Reciprocal-rank fusion (public method: Cormack et al. 2009 — the
    standard way hybrid search merges lexical and vector rankings):
    ``score(d) = sum over rankings of 1/(k + rank_i(d))``, documents
    missing from a ranking contribute nothing.  Returns
    (id, rrf_score, n_rankings, rank) ordered by fused score with a
    deterministic id tie-break.

    Scale shape: a union of the (already small) top-k ranking tables +
    one groupBy on the id — trivially cheap next to the rankings that
    produced the inputs; the fusion itself never touches the corpus.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    # a repeated id WITHIN one ranking (unioned candidate windows) must
    # contribute once — its best rank — or rrf_score double-counts and
    # n_rankings over-reports (same input class ann_recall dedups)
    parts = [
        r.groupBy(F.col(id_column).alias("__id"))
        .agg(F.min(F.col(rank_column).cast("double")).alias("__rk"))
        .select("__id",
                (1.0 / (F.lit(float(k)) + F.col("__rk"))).alias("__contrib"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.groupBy("__id")
             .agg(F.round(F.sum("__contrib"), round_digits)
                  .alias("rrf_score"),
                  F.count("*").alias("n_rankings")))
    w = Window.orderBy(F.desc("rrf_score"), F.asc("__id"))
    # the fused table is (sum of top-k lists) rows — tiny; a plain
    # row_number window over it is driver-bounded by construction
    return (fused.withColumn("rank", F.row_number().over(w).cast("int"))
            .select(F.col("__id").alias(id_column), "rrf_score",
                    "n_rankings", "rank"))


# --- Johnson-Lindenstrauss random projection ---------------------------------

def random_projection(df: DataFrame, dim: int, out_dim: int,
                      vector_column: str = "embedding",
                      proj_column: str = "proj",
                      seed: int = 23,
                      round_digits: int | None = None) -> DataFrame:
    """Dense random projection to ``out_dim`` dimensions (the
    Johnson-Lindenstrauss dimensionality reduction — public technique:
    Achlioptas 2003 / Indyk-Motwani): ``proj[d] = dot(v, plane_d) /
    sqrt(out_dim)`` over the same deterministic LCG unit planes the LSH
    bucketer uses, so a SQL oracle can embed them as literals.

    The scale use: shrink 1024-d embeddings to 32-64 dims BEFORE the
    quadratic stages (ANN candidate generation, semantic-dedup gram
    blocks) — pairwise cosines are preserved within the JL distortion
    bound while per-pair cost drops by dim ratio.  Map-only native
    expressions (one HOF dot per output dim), zero shuffles, inherits
    the input partitioning.
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    planes = _hyperplanes(dim, out_dim, seed)
    scale = 1.0 / math.sqrt(float(out_dim))
    v = as_double_array(F.col(vector_column))
    comps = []
    for p in planes:
        c = dot(v, F.array(*[F.lit(float(x)) for x in p])) * F.lit(scale)
        if round_digits is not None:
            # +0.0 folds IEEE -0.0 to +0.0 for engine hash parity
            c = F.round(c, round_digits) + F.lit(0.0)
        comps.append(c)
    return df.withColumn(proj_column, F.array(*comps))


# --- nearest-class-mean (prototype) classification ---------------------------

def nearest_centroid_confusion(df: DataFrame, dim: int,
                               id_column: str = "vec_id",
                               vector_column: str = "embedding",
                               label_column: str = "label",
                               test_mod: int = 5,
                               centroid_round: int = 6) -> DataFrame:
    """Nearest-class-mean classification audit (Rocchio / prototype
    classifier — the standard label-quality check over an embedding
    table): split rows by ``id % test_mod`` into train/test, compute the
    per-label mean vector on train, assign each test vector to the
    nearest centroid by squared L2, and return the confusion matrix
    ``(label_true, label_pred, n)``.

    Scale shape: one posexplode -> (label, dim)-keyed mean aggregation
    with map-side combine (|labels| x dim rows — broadcast back); the
    test side joins that tiny table on the dim position and reduces to
    one integer distance per (row, candidate label); prediction is a
    bounded window per test row.  Engine-exact parity: centroid means
    round to ``centroid_round`` digits and the squared-distance terms
    quantize to integer nano-units BEFORE the cross-dim sum, so
    summation order cannot change a prediction.
    """
    if test_mod < 2:
        raise ValueError(f"test_mod must be >= 2, got {test_mod}")
    ex = df.select(
        F.col(id_column).alias("__id"),
        F.col(label_column).alias("__lab"),
        F.posexplode(as_double_array(F.col(vector_column)))
        .alias("pos", "v"),
    )
    is_test = F.col("__id") % test_mod == 0
    cent = (ex.filter(~is_test)
            .groupBy(F.col("__lab").alias("__cand"), "pos")
            .agg(F.round(F.avg("v"), centroid_round).alias("m")))
    term = F.round((F.col("v") - F.col("m")) * (F.col("v") - F.col("m"))
                   * F.lit(1e9), 0).cast("long")
    dist = (ex.filter(is_test)
            .join(F.broadcast(cent), "pos")
            .groupBy("__id", "__lab", "__cand")
            .agg(F.sum(term).alias("d")))
    w = Window.partitionBy("__id").orderBy(F.asc("d"), F.asc("__cand"))
    pred = (dist.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1))
    return (pred.groupBy(F.col("__lab").alias("label_true"),
                         F.col("__cand").alias("label_pred"))
            .agg(F.count("*").cast("long").alias("n")))

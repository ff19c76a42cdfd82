"""Time-series operator queries: resample+gap-fill, per-key EWMA,
gap-based trip segmentation, PSI drift.  Shares the REGISTRY in
queries.py; same determinism rules (integer quantization before
cross-engine sums, F.round == DuckDB ROUND half-away-from-zero on
positive values, identical IEEE expression trees per row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoparquet_io_spark.queries import register
from geoparquet_io_spark.testsupport.tables import (
    load_table,
    event_lonlat,
    EVENT_LON_SQL,
    EVENT_LAT_SQL,
)
from geoparquet_io_spark.operators.timeseries import (
    HAVERSINE_SQL,
    ewma,
    population_stability,
    resample_gapfill,
    trip_segments,
)

_SEC = "(epoch_us(ts) // 1000000)"
_BUCKET = f"({_SEC} - ({_SEC} % 21600))"

_GAPFILL_WINDOW = ("PARTITION BY user_id ORDER BY bucket_sec "
                   "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
_GAPFILL_WINDOW_F = ("PARTITION BY user_id ORDER BY bucket_sec "
                     "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING")


@register(
    "events_resample_gapfill",
    f"""
    WITH agg AS (
      SELECT user_id, {_BUCKET} AS bucket_sec,
             ROUND(AVG(value), 6) AS avg_value
      FROM events WHERE user_id < 10 GROUP BY 1, 2
    ), rng AS (
      SELECT user_id, MIN(bucket_sec) AS lo, MAX(bucket_sec) AS hi
      FROM agg GROUP BY 1
    ), spine AS (
      SELECT user_id, UNNEST(range(lo, hi + 21600, 21600)) AS bucket_sec
      FROM rng
    ), j AS (
      SELECT s.user_id, s.bucket_sec, a.avg_value
      FROM spine s LEFT JOIN agg a USING (user_id, bucket_sec)
    ), w AS (
      SELECT user_id, bucket_sec, avg_value,
        LAST_VALUE(avg_value IGNORE NULLS) OVER ({_GAPFILL_WINDOW}) AS prev_v,
        FIRST_VALUE(avg_value IGNORE NULLS) OVER ({_GAPFILL_WINDOW_F}) AS next_v,
        LAST_VALUE(CASE WHEN avg_value IS NOT NULL THEN bucket_sec END IGNORE NULLS)
          OVER ({_GAPFILL_WINDOW}) AS prev_t,
        FIRST_VALUE(CASE WHEN avg_value IS NOT NULL THEN bucket_sec END IGNORE NULLS)
          OVER ({_GAPFILL_WINDOW_F}) AS next_t
      FROM j
    )
    SELECT user_id, bucket_sec, avg_value,
      CASE WHEN prev_v IS NULL THEN next_v
           WHEN next_v IS NULL THEN prev_v
           WHEN next_t = prev_t THEN prev_v
           ELSE ROUND(prev_v + (next_v - prev_v)
                      * ((bucket_sec - prev_t) / (next_t - prev_t)), 6)
      END AS filled_value,
      (avg_value IS NULL) AS is_gap
    FROM w
    """,
)
def q_resample_gapfill(spark, sf_dir):
    """Fixed-bucket resample with per-key spine + linear interpolation
    (operators/timeseries.py:resample_gapfill).  Spine derives from each
    key's own min/max bucket — no global calendar cross join."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return resample_gapfill(ev, "ts", "value", 21600, "user_id")


@register(
    "events_ewma_value",
    """
    WITH RECURSIVE seq AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 40
    ), r AS (
      SELECT user_id, rn, value AS ewma FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, 0.75 * r.ewma + 0.25 * s.value
      FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, CAST(rn AS BIGINT) AS rn, ROUND(ewma, 6) AS ewma FROM r
    """,
)
def q_ewma(spark, sf_dir):
    """Per-key EWMA (alpha=0.25 — exact binary float, so the pandas C
    ewm kernel is bit-identical to the oracle's recursive CTE recurrence
    0.75*prev + 0.25*x; verified in tests).  applyInPandas per key —
    keys parallel, recurrence sequential only within a key."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return ewma(ev, "user_id", "ts", "value", alpha=0.25,
                order_tiebreak="event_id")


_TRIP_W = "PARTITION BY user_id ORDER BY ts, event_id"
_TRIP_HAV = HAVERSINE_SQL.format(lat1="prev_lat", lon1="prev_lon",
                                 lat2="lat", lon2="lon")


@register(
    "events_trip_segments",
    f"""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             {EVENT_LON_SQL} AS lon, {EVENT_LAT_SQL} AS lat,
             {_SEC} AS sec
      FROM events
    ), lagged AS (
      SELECT *, LAG(sec) OVER ({_TRIP_W}) AS prev_sec,
             LAG(lon) OVER ({_TRIP_W}) AS prev_lon,
             LAG(lat) OVER ({_TRIP_W}) AS prev_lat
      FROM pts
    ), flags AS (
      SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 21600
                     THEN 1 ELSE 0 END AS new_trip
      FROM lagged
    ), steps AS (
      SELECT *,
        CASE WHEN new_trip = 1 THEN 0
             ELSE CAST(ROUND({_TRIP_HAV} * 1000.0, 0) AS BIGINT) END AS step_m,
        CAST(SUM(new_trip) OVER ({_TRIP_W}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS trip_no
      FROM flags
    )
    SELECT user_id, trip_no,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(sec) AS start_sec, MAX(sec) AS end_sec,
           (MAX(sec) - MIN(sec)) AS duration_sec,
           CAST(SUM(step_m) AS BIGINT) AS distance_m
    FROM steps GROUP BY user_id, trip_no
    """,
)
def q_trip_segments(spark, sf_dir):
    """Gap sessionization into trips + per-trip haversine distance
    (operators/timeseries.py:trip_segments).  Step distances quantized
    to integer metres before the per-trip sum (order-independent)."""
    ev = event_lonlat(load_table(spark, sf_dir, "events"))
    return trip_segments(ev, "user_id", "ts", "lon", "lat",
                         gap_seconds=21600, order_tiebreak="event_id")


@register(
    "stats_psi_drift",
    """
    WITH a AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS BIGINT), 0), 9)
               AS bin, COUNT(*) AS n_a
      FROM events WHERE (epoch_us(ts) // 1000000) < 1705363200 GROUP BY 1
    ), b AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS BIGINT), 0), 9)
               AS bin, COUNT(*) AS n_b
      FROM events WHERE (epoch_us(ts) // 1000000) >= 1705363200 GROUP BY 1
    ), m AS (
      SELECT COALESCE(a.bin, b.bin) AS bin,
             CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
             CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b
      FROM a FULL JOIN b ON a.bin = b.bin
    ), t AS (
      SELECT CAST(SUM(n_a) AS DOUBLE) AS ta, CAST(SUM(n_b) AS DOUBLE) AS tb FROM m
    )
    SELECT bin, n_a, n_b,
      CAST(ROUND((GREATEST(n_a / ta, 1e-6) - GREATEST(n_b / tb, 1e-6))
                 * LN(GREATEST(n_a / ta, 1e-6) / GREATEST(n_b / tb, 1e-6))
                 * 1e6, 0) AS BIGINT) AS term_micro
    FROM m, t
    """,
)
def q_psi_drift(spark, sf_dir):
    """Population Stability Index between the first half of the month
    and the rest (operators/timeseries.py:population_stability).  Terms
    emitted per bin in integer micro-units; total PSI =
    sum(term_micro)/1e6 — order-independent."""
    ev = load_table(spark, sf_dir, "events")
    # epoch-second cut: type-agnostic across TIMESTAMP/TIMESTAMP_NTZ
    # (the ns-precision SFs load as TIMESTAMP, the us ones as NTZ)
    cut = 1705363200  # 2024-01-16T00:00:00Z
    a = ev.filter(F.unix_timestamp("ts") < cut)
    b = ev.filter(F.unix_timestamp("ts") >= cut)
    return population_stability(a, b, "value", lo=0.0, hi=500.0, n_bins=10)


# hot-cell guard shared by the query and its oracle: hottest legitimate
# cell is 14 users at sf0.01 / 68 at sf0.1, so 100 never fires on real
# data while bounding an adversarial everyone-visits-one-cell corpus
_TRAJ_CELL_CAP = 100


@register(
    "trajectory_topk_similar",
    f"""
    WITH pts AS (
      SELECT user_id, {EVENT_LON_SQL} AS lon, {EVENT_LAT_SQL} AS lat
      FROM events
    ),
    sig0 AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(lon / 5.0) AS BIGINT) AS cx,
             CAST(FLOOR(lat / 5.0) AS BIGINT) AS cy
      FROM pts
    ),
    freq AS (SELECT cx, cy, COUNT(*) AS cf FROM sig0 GROUP BY 1, 2),
    sig AS (SELECT s.user_id, s.cx, s.cy
            FROM sig0 s JOIN freq f ON s.cx = f.cx AND s.cy = f.cy
            WHERE f.cf <= {_TRAJ_CELL_CAP}),
    sz AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM sig GROUP BY 1),
    pairs AS (
      SELECT a.user_id AS ka, b.user_id AS kb,
             CAST(COUNT(*) AS BIGINT) AS shared_cells
      FROM sig a JOIN sig b
        ON a.cx = b.cx AND a.cy = b.cy AND a.user_id != b.user_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.ka, p.kb, p.shared_cells,
             ROUND(p.shared_cells / (sa.n + sb.n - p.shared_cells), 6)
               AS jaccard
      FROM pairs p
      JOIN sz sa ON sa.user_id = p.ka
      JOIN sz sb ON sb.user_id = p.kb
    )
    SELECT ka AS user_id, kb AS neighbor, shared_cells, jaccard,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY ka
                                       ORDER BY jaccard DESC, kb) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def q_trajectory_topk(spark, sf_dir):
    """Distributed trajectory top-k similarity, REPOSE shape (ICDE 2021;
    PAPERS.md): per-user point sets -> grid-cell signatures -> candidates
    meet only through shared cells (bucketed self-join, no trajectory
    cross product) -> Jaccard top-k per trajectory
    (operators/timeseries.py:trajectory_topk_similar)."""
    from geoparquet_io_spark.operators.timeseries import \
        trajectory_topk_similar

    ev = event_lonlat(load_table(spark, sf_dir, "events"))
    return trajectory_topk_similar(ev, "user_id", "lon", "lat",
                                   cell_size=5.0, k=5,
                                   max_cell_freq=_TRAJ_CELL_CAP)


@register(
    "discovery_spatial_joinability",
    f"""
    WITH cand AS (
      SELECT DISTINCT event_type AS dataset,
             CAST(FLOOR({EVENT_LON_SQL} / 20.0) AS BIGINT) AS cx,
             CAST(FLOOR({EVENT_LAT_SQL} / 20.0) AS BIGINT) AS cy
      FROM events
    ),
    q AS (
      SELECT DISTINCT
             CAST(FLOOR((((c_custkey * 131) % 3600) / 10.0 - 180.0) / 20.0)
                  AS BIGINT) AS cx,
             CAST(FLOOR((((c_custkey * 197) % 1700) / 10.0 - 85.0) / 20.0)
                  AS BIGINT) AS cy
      FROM customer
    ),
    qn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM q),
    sz AS (SELECT dataset, CAST(COUNT(*) AS BIGINT) AS n_cells
           FROM cand GROUP BY 1),
    sh AS (SELECT c.dataset, CAST(COUNT(*) AS BIGINT) AS shared_cells
           FROM cand c JOIN q USING (cx, cy) GROUP BY 1),
    scored AS (
      SELECT sz.dataset, sz.n_cells,
             COALESCE(sh.shared_cells, 0) AS shared_cells,
             ROUND(COALESCE(sh.shared_cells, 0) / qn.n, 6) AS coverage,
             ROUND(COALESCE(sh.shared_cells, 0)
                   / (sz.n_cells + qn.n - COALESCE(sh.shared_cells, 0)), 6)
               AS jaccard
      FROM sz LEFT JOIN sh USING (dataset), qn
    )
    SELECT dataset, n_cells, shared_cells, coverage, jaccard,
           CAST(row_number() OVER (ORDER BY coverage DESC, jaccard DESC,
                                   dataset) AS INTEGER) AS rank
    FROM scored
    """,
)
def q_spatial_joinability(spark, sf_dir):
    """Dataset-discovery ranking: which event-type sub-datasets are
    spatially joinable with the customer point table (ICDE 2025
    "Joinable Search Over Multi-Source Spatial Datasets", PAPERS.md;
    operators/discovery.py:spatial_joinability) — overlap + coverage
    from KB-scale cell signatures, no join executed."""
    from geoparquet_io_spark.operators.discovery import spatial_joinability
    from geoparquet_io_spark.testsupport.tables import customer_lonlat

    ev = event_lonlat(load_table(spark, sf_dir, "events"))
    cust = customer_lonlat(load_table(spark, sf_dir, "customer"))
    return spatial_joinability(ev, cust, "event_type", "lon", "lat",
                               cell_size=20.0)

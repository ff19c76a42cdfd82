"""Grid-density spatial clustering (DBSCAN-style, cell granularity).

Classic DBSCAN is pairwise (eps-neighborhood joins — quadratic in dense
regions).  At 100 TB the standard scale-out reformulation is grid-based:
density is measured per cell (one hash aggregation over data rows), and
clusters are connected components over ADJACENT DENSE CELLS — a graph
whose size is bounded by the number of occupied cells, never by the row
count.  Rows shuffle exactly once (the cell count groupBy); everything
after runs on the tiny cell table.  This matches the STING/grid-DBSCAN
family; eps is the cell size and min_pts the per-cell density threshold.

Beyond-reference operator (the reference has no clustering); composed
from this repo's own primitives (connected_components from
operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# collision-free (cx, cy) -> single long encoding: 31 bits per axis
# (62 total, inside int64) supports cell indices to ~1e9 — metre-scale
# cells over projected CRSs included, not just lon/lat (the old 21-bit
# form collided past |index| ~1e6).  The SQL oracle interpolates these
# same constants, so both engines stay in lockstep.
_OFF = 1 << 30
_MUL = 1 << 31


def cell_id(cx, cy):
    return (cx + F.lit(_OFF)) * F.lit(_MUL) + (cy + F.lit(_OFF))


def cell_id_sql(cx: str, cy: str) -> str:
    return f"(({cx}) + {_OFF}) * {_MUL} + (({cy}) + {_OFF})"


def grid_density_clusters(
    df: DataFrame,
    lon_column: str = "lon",
    lat_column: str = "lat",
    cell_size: float = 1.0,
    min_pts: int = 5,
    max_iterations: int = 20,
) -> DataFrame:
    """Label every row with its density-cluster id (NULL = noise).

    1. cell assignment: ``(floor(lon/s), floor(lat/s))`` — map-only.
    2. ONE groupBy counts rows per cell; cells with ``>= min_pts`` rows
       are dense.
    3. dense cells meeting in 8-neighborhood adjacency (plus a self
       edge, so isolated dense cells survive as singleton clusters)
       form edges via an EQUI-join on shifted coordinates — a 9x
       explode of the dense-cell table, never of data rows.
    4. :func:`~geoparquet_io_spark.operators.dedup.connected_components`
       labels each dense cell with the min reachable cell id.
    5. rows broadcast-join back to their cell's component; rows in
       non-dense cells get NULL (noise).

    The cluster id is the minimum encoded cell id in the component —
    deterministic across engines and partitionings.
    """
    from geoparquet_io_spark.operators.dedup import connected_components

    # Non-finite -> NULL before floor: floor(NaN).cast(long) is 0 in
    # Spark, so NaN-coordinate rows would fabricate density in cell
    # (0, 0); floor(±Inf).cast(long) saturates to Long.Min/MaxValue, so
    # Inf rows would fabricate a shared saturated cell key (the same
    # fabricated-key class as the r9 quadkey/morton/geohash gates).
    # NULL cells group together but their cell_id is NULL, which no
    # equi-join matches — they fall out as noise, which is correct.
    inf = F.lit(float("inf"))
    lon_ok = F.when(~F.isnan(F.col(lon_column))
                    & (F.abs(F.col(lon_column)) != inf), F.col(lon_column))
    lat_ok = F.when(~F.isnan(F.col(lat_column))
                    & (F.abs(F.col(lat_column)) != inf), F.col(lat_column))
    cx = F.floor(lon_ok / F.lit(float(cell_size))).cast("long")
    cy = F.floor(lat_ok / F.lit(float(cell_size))).cast("long")
    # either axis NaN/NULL poisons both (a half-NaN row must not land
    # in a real cell row keyed by the finite axis)
    both = lon_ok.isNotNull() & lat_ok.isNotNull()
    pts = df.withColumn("__cx", F.when(both, cx)) \
        .withColumn("__cy", F.when(both, cy))
    cells = pts.groupBy("__cx", "__cy").agg(F.count("*").alias("__n"))
    dense = cells.filter(F.col("__n") >= int(min_pts)).select(
        F.col("__cx").alias("cx"), F.col("__cy").alias("cy"),
        cell_id(F.col("__cx"), F.col("__cy")).alias("cell"))
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    probes = (dense.withColumn("__o", F.explode(offsets))
              .select(F.col("cell").alias("src"),
                      (F.col("cx") + F.col("__o.dx")).alias("nx"),
                      (F.col("cy") + F.col("__o.dy")).alias("ny")))
    nbr = dense.select(F.col("cx").alias("nx"), F.col("cy").alias("ny"),
                       F.col("cell").alias("dst"))
    edges = probes.join(nbr, ["nx", "ny"]).select("src", "dst")
    comp = connected_components(edges, id_a="src", id_b="dst",
                                max_iterations=max_iterations,
                                id_column="cell", component_column="cluster")
    comp = comp.select(F.col("cell"), F.col("cluster"))
    labeled = pts.join(
        F.broadcast(comp),
        cell_id(F.col("__cx"), F.col("__cy")) == F.col("cell"),
        "left",
    )
    return labeled.drop("cell")


def cluster_summary(labeled: DataFrame, lon_column: str = "lon",
                    lat_column: str = "lat") -> DataFrame:
    """Per-cluster rollup of :func:`grid_density_clusters` output
    (noise rows excluded): size, cell extent, point bbox."""
    return (
        labeled.filter(F.col("cluster").isNotNull())
        .groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.countDistinct("__cx", "__cy").cast("long").alias("n_cells"),
            F.min(lon_column).alias("xmin"),
            F.min(lat_column).alias("ymin"),
            F.max(lon_column).alias("xmax"),
            F.max(lat_column).alias("ymax"),
        )
    )

"""Dataset discovery: rank which spatial datasets are JOINABLE with a
query dataset before paying for any join — the "Joinable Search Over
Multi-Source Spatial Datasets: Overlap, Coverage" problem (ICDE 2025,
PAPERS.md).

Each candidate dataset collapses to its grid-cell signature (distinct
visited cells — the same compaction trajectory search uses), the query
dataset likewise; candidates are scored by
- ``coverage``: fraction of the QUERY's cells a candidate touches (can
  a join enrich most of my data?), and
- ``jaccard``: symmetric overlap (are the datasets about the same
  region?),
and ranked.  All set arithmetic over signatures: the per-dataset cell
sets are tiny relative to row counts, so ranking a 1000-dataset catalog
against a 100 TB query table costs one signature scan per side plus
KB-scale joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cell_signature(df: DataFrame, x_column: str, y_column: str,
                   cell_size: float,
                   dataset_column: str | None = None) -> DataFrame:
    """Distinct grid cells touched, optionally per dataset tag.

    NULL/NaN coordinates are dropped: they'd yield a (null, null) cell
    that counts in the signature size but can never match an equi-join,
    so coverage/Jaccard would be deflated for every comparison."""
    x, y = F.col(x_column), F.col(y_column)
    cx = F.floor(x / F.lit(float(cell_size))).cast("long")
    cy = F.floor(y / F.lit(float(cell_size))).cast("long")
    cols = ([F.col(dataset_column).alias("dataset")]
            if dataset_column else [])
    return (df.filter(x.isNotNull() & y.isNotNull()
                      & ~F.isnan(x.cast("double"))
                      & ~F.isnan(y.cast("double")))
            .select(*cols, cx.alias("cx"), cy.alias("cy")).distinct())


def spatial_joinability(candidates: DataFrame, query: DataFrame,
                        dataset_column: str, x_column: str, y_column: str,
                        cell_size: float = 5.0,
                        round_digits: int = 6) -> DataFrame:
    """Rank every dataset in ``candidates`` (tagged by
    ``dataset_column``) by spatial joinability against ``query``
    (same x/y columns).  Output per dataset: cell counts, shared cells,
    coverage of the query's extent, Jaccard overlap, and rank (by
    coverage, then jaccard, then name)."""
    cand = cell_signature(candidates, x_column, y_column, cell_size,
                          dataset_column=dataset_column)
    q = cell_signature(query, x_column, y_column, cell_size)
    q_n = q.count()  # bounded: the signature, not the table
    sizes = cand.groupBy("dataset").agg(F.count("*").alias("n_cells"))
    shared = (cand.join(q, ["cx", "cy"])
              .groupBy("dataset").agg(F.count("*").alias("shared_cells")))
    scored = (
        sizes.join(shared, "dataset", "left")
        .withColumn("shared_cells",
                    F.coalesce(F.col("shared_cells"), F.lit(0)))
        .withColumn("coverage", F.round(
            F.col("shared_cells") / F.lit(float(q_n)), round_digits))
        .withColumn("jaccard", F.round(
            F.col("shared_cells")
            / (F.col("n_cells") + F.lit(q_n) - F.col("shared_cells")),
            round_digits))
    )
    # unpartitioned window is safe here: the ranked frame is one row per
    # CATALOG DATASET (thousands at most), never per data row
    w = Window.orderBy(F.desc("coverage"), F.desc("jaccard"), F.asc("dataset"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("dataset", F.col("n_cells").cast("long").alias("n_cells"),
                    F.col("shared_cells").cast("long").alias("shared_cells"),
                    "coverage", "jaccard", "rank"))

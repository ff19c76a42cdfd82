"""Distributed graph operators for corpus curation.

Web-scale curation pipelines rank documents by link-graph centrality
(CommonCrawl publishes harmonic-centrality/PageRank ranks; CCNet-style
recipes filter on them).  ``pagerank`` is the classic damped power
iteration expressed as pure DataFrame joins + partial aggregations —
each iteration is one shuffle on the edge destination, the same shape
GraphX/Pregel lowers to.

Related: ``operators/dedup.py`` already has connected components
(min-label propagation + pointer jumping) for transitive dedup groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iterations: int = 3,
             round_digits: int | None = 6,
             checkpoint_every: int = 8) -> DataFrame:
    """PageRank by damped power iteration (no dangling-mass
    redistribution — ranks are comparable, the common simplification).

    100 TB posture: node/degree tables are computed once and reused; each
    iteration is `edges JOIN pr ON src` (co-partitionable on src) then one
    partial-agg shuffle on dst — no collect, no cartesian.  Long runs
    localCheckpoint every ``checkpoint_every`` iterations to cut the
    lineage (same guard as dedup's pointer jumping).

    Returns (node, pagerank).
    """
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # materialize once: every iteration joins e and rebuilds pr from
    # nodes — without the checkpoint each iteration replays the edge
    # dedup + degree-join + node-union shuffles from scratch
    # NULL endpoints are dropped like triangle_count does: a null node
    # would inflate n_nodes, emit a spurious null rank row, and its
    # edges' rank mass would silently vanish anyway (null keys never
    # match in the join) — r9 review
    # LAZY checkpoints: the nodes.count() two lines down is a full
    # all-partitions aggregate that materializes both (nodes' plan runs
    # through e), so eager would pay two extra job cycles for state the
    # count forces anyway; e's expensive dedup sits behind its own
    # shuffle, so the union's two branches share one map pass even
    # before the checkpoint blocks exist
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()) \
        .distinct()
    # fold the out-degree INTO the checkpointed edge table: the inner
    # join keeps exactly e0's rows (every src is in its own groupBy), so
    # each power iteration probes ONE table instead of re-joining outdeg
    # against every edge per iteration (one edge-scale hash probe pass
    # per iteration saved; the per-edge payload grows by one double).
    # AQE stage reuse computes e0's dedup exchange once inside this job.
    outdeg = e0.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    e = e0.join(outdeg, "src").localCheckpoint(eager=False)
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=False))
    n_nodes = float(nodes.count())   # scalar agg (same pattern as tf-idf's N)
    if n_nodes == 0:
        # empty edge set: an empty rank table, not a ZeroDivisionError
        return nodes.select(F.col("node"),
                            F.lit(None).cast("double").alias("pagerank"))
    base = (1.0 - damping) / n_nodes

    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for i in range(iterations):
        contrib = (e.join(pr, e.src == pr.node)
                   .select(F.col("dst").alias("node"),
                           (F.col("pr") / F.col("deg")).alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("m"))
        pr = nodes.join(sums, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping)
             * F.coalesce(F.col("m"), F.lit(0.0))).alias("pr"),
        )
        if (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    out = pr.select(F.col("node"),
                    (F.round(F.col("pr"), round_digits)
                     if round_digits is not None else F.col("pr")).alias("pagerank"))
    return out


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst",
                   per_vertex: bool = True) -> DataFrame:
    """Exact triangle counting via the degree-ordered edge-iterator.

    The undirected edge set is oriented from the (degree, id)-smaller
    endpoint to the larger, so every triangle materialises as exactly
    one wedge-plus-closing-edge match and — the classic bound — the
    wedge join fans out at most O(m^{3/2}) candidates regardless of
    skew: a hub of degree d contributes wedges only from its ~sqrt(m)
    higher-ordered neighbors, never d^2.  Two equi-join shuffles total;
    no windows, no cross product.

    Returns (vertex, n_triangles) when ``per_vertex`` (vertices in no
    triangle are absent), else a single-row (n_triangles) total.
    """
    # no numeric cast: vertex ids may be strings (URLs, doc hashes) —
    # cast('long') nulled them and silently dropped every edge;
    # least/greatest and the (degree, id) orientation order any type
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .distinct())
    deg = (e.select(F.col("a").alias("v"))
           .unionAll(e.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count("*").alias("deg")))
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    # orient by (degree, id): lo -> hi
    oriented = (e.join(da, "a").join(db, "b")
                .select(
                    F.when((F.col("da") < F.col("db"))
                           | ((F.col("da") == F.col("db"))
                              & (F.col("a") < F.col("b"))),
                           F.col("a")).otherwise(F.col("b")).alias("lo"),
                    F.when((F.col("da") < F.col("db"))
                           | ((F.col("da") == F.col("db"))
                              & (F.col("a") < F.col("b"))),
                           F.col("b")).otherwise(F.col("a")).alias("hi"))
                .localCheckpoint(eager=False))
    w1 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    w2 = oriented.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    wedges = w1.join(w2, "y").select("x", "y", "z")
    closing = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tris = wedges.join(closing, ["x", "z"])
    if not per_vertex:
        return tris.agg(F.count("*").alias("n_triangles"))
    verts = (tris.select(F.col("x").alias("vertex"))
             .unionAll(tris.select(F.col("y").alias("vertex")))
             .unionAll(tris.select(F.col("z").alias("vertex"))))
    return verts.groupBy("vertex").agg(F.count("*").alias("n_triangles"))

"""Link-graph analytics over the outlink table (``ops/html.py``'s
``extract_links`` output, resolved to node ids): fixed-point PageRank
and degree stats — the web-graph side of a crawl pipeline (crawl
prioritization, quality priors for curation).

PageRank runs the power method for a FIXED number of iterations in
pure int64 fixed-point arithmetic: ranks are scaled by ``SCALE``
(2^40), per-edge contributions are ``rank_u DIV outdeg_u`` (integer
division), and damping is the rational ``85/100`` applied as
``(85 * s) DIV 100``. Integer sums are associative-commutative with
no rounding, so the result is bit-identical regardless of partition
count, join order, or engine — which is what lets a SQL oracle replay
the whole computation with unrolled CTEs (the same trick as the
fixed-point k-means quantizer in ops/similarity.py). Floating-point
PageRank would differ in the last ulps between Spark's and any
replayer's summation orders.

Semantics (documented variant): dangling-node mass evaporates instead
of being redistributed — ranks remain a valid relative ordering (the
common simplified variant); redistributing would add a 1-row aggregate
per iteration, not a scale problem, just a different contract.

Scale shape per iteration: one edges⋈ranks shuffle join on ``src``
(both sides partitioned by the join key), one ``groupBy(dst)``
partial-aggregated sum, one ranks-sized left join — O(E) rows moved
per iteration, the textbook distributed PageRank plan. The iteration
count is a constant (default 3), so the driver loop is bounded and
data-independent; ``localCheckpoint`` truncates the per-iteration
lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1 << 40
DAMP_NUM, DAMP_DEN = 85, 100


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, out_degree, in_degree) over ``edges(src, dst)`` — two
    partial-agged groupBys and one outer join."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("long").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
        )
    )


def pagerank_fixedpoint(edges: DataFrame, iters: int = 3,
                        n_nodes: int | None = None) -> DataFrame:
    """(node, rank_fp): int64 fixed-point PageRank after ``iters``
    power-method steps over ``edges(src, dst)``.

    rank⁰(v) = SCALE DIV n
    rankᵏ(v) = ((100−85)·SCALE DIV n) DIV 100
             + (85 · Σ_{(u,v)∈E} (rankᵏ⁻¹(u) DIV outdeg(u))) DIV 100

    ``n_nodes`` skips the count job when the caller already knows |V|
    (the oracle computes it from the same edge set either way).
    """
    src = F.col("src").cast("long")
    dst = F.col("dst").cast("long")
    e = edges.select(src.alias("src"), dst.alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = n_nodes if n_nodes is not None else nodes.count()
    if n == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = ((DAMP_DEN - DAMP_NUM) * (SCALE // n)) // DAMP_DEN

    rank = nodes.withColumn("rank_fp", F.lit(SCALE // n).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(rank.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            # `div` is EXACT int64 division — float `/` + cast can be
            # off by one ulp at 2^40 magnitudes and break engine parity
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        rank = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({DAMP_NUM} * coalesce(s, 0L)) div {DAMP_DEN}")
                )
                .cast("long")
                .alias("rank_fp"),
            )
            .localCheckpoint()
        )
    return rank

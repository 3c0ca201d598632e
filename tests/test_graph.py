"""Integer-exact PageRank over the deterministic link graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from eodal_spark.operators import graph as G


def test_rank_mass_conserved_without_sinks_only(spark):
    """With every node having out-degree d and no dangling mass beyond
    floor-division loss, total rank stays within n*(base + damping) of
    n*MICRO (each division floors away < 1 micro-rank per edge)."""
    n = 2_000
    edges = G.synth_links(spark, n, out_deg=3)
    ranks = G.pagerank_micro(edges, n, iters=3)
    total = ranks.agg(F.sum("rank_micro")).first()[0]
    assert 0.95 * n * G.MICRO < total <= n * G.MICRO


def test_sinks_get_base_rank_and_hubs_exceed_it(spark):
    n = 2_000
    edges = G.synth_links(spark, n, out_deg=3)
    ranks = G.pagerank_micro(edges, n, iters=3)
    base = (1000 - 850) * G.MICRO // 1000
    in_deg = edges.groupBy(F.col("dst").alias("id")).count()
    joined = ranks.join(in_deg, "id", "left").collect()
    sinks = [r for r in joined if r["count"] is None]
    assert sinks and all(r.rank_micro == base for r in sinks)
    # the most-linked nodes accumulate rank above the uniform start
    assert any(r.rank_micro > G.MICRO for r in joined)
    top = max(joined, key=lambda r: r.rank_micro)
    assert (top["count"] or 0) >= 4  # the max-rank node is well linked


def test_pagerank_partition_invariant(spark):
    """Integer arithmetic ⇒ identical ranks under any partitioning (the
    float formulation cannot promise this)."""
    n = 1_000
    e1 = G.synth_links(spark, n, out_deg=3)
    e2 = e1.repartition(13)
    r1 = {r.id: r.rank_micro for r in G.pagerank_micro(e1, n, iters=3).collect()}
    r2 = {r.id: r.rank_micro for r in G.pagerank_micro(e2, n, iters=3).collect()}
    assert r1 == r2


def test_pagerank_iteration_is_agg_shaped(spark):
    """Inspect ONE round pre-checkpoint (the checkpointed result is an
    RDD scan that would hide any regression)."""
    n = 500
    edges = G.synth_links(spark, n, 3)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks0 = spark.range(n).select(
        F.col("id"), F.lit(G.MICRO).cast("long").alias("rank_micro")
    )
    out = G._rank_round(edges.join(deg, "src"), ranks0, n, 850)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "Window" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan

"""Link-graph analytics: deterministic link synthesis + integer-exact
PageRank.

Crawl pipelines weight documents by link centrality (the ranking signal
behind crawl frontiers and training-data quality weighting).  The
reference has no graph operator (its closest analogue is the per-scene
quality ranking, `eodal/mapper/mapper.py:565-616`); this provides the
relational formulation at corpus scale:

* every iteration is ONE join + ONE aggregation on the node key —
  map-side-combinable sums, no windows, no driver-side adjacency;
* arithmetic is INTEGER throughout (micro-rank units, floor division),
  so the result is bit-identical across engines and partitionings —
  float summation order can never drift a gate;
* lineage is truncated per iteration (``localCheckpoint``), the same
  iterative-plan discipline as `dedup.connected_components`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# one full unit of rank = 1_000_000 micro-ranks.  Overflow bounds: the
# damping multiply 850 * Σcontrib (Σ ≤ n·MICRO) stays inside int64 for
# n up to ~1e10, and synth_links' src*2654435761 for n up to ~3.4e9 —
# safe through corpus scale (10^9 docs), NOT unbounded
MICRO = 1_000_000


def synth_links(spark: SparkSession, n: int, out_deg: int = 3) -> DataFrame:
    """Deterministic link graph over doc ids 0..n-1: doc ``i`` links to
    ``((i*2654435761 mod 2^31) div (1+j)) mod n`` for j in 0..out_deg-1.
    The Knuth-hash + divide map is deliberately NON-bijective, so
    in-degree is skewed (0..~2·out_deg, with true sinks) like a real
    webgraph — an affine map ``(a·i+c) mod n`` would be a permutation
    per j and give every node identical rank.  Every node still has
    out-degree ``out_deg`` (no dangling-mass term).  Same derivation
    reproducible as SQL (`sql_links_subquery`)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(0), F.lit(out_deg - 1))).alias("j"),
        )
        .selectExpr(
            "src",
            f"((src * 2654435761) % 2147483648) div (1 + j) % {n} AS dst",
        )
    )


def sql_links_subquery(n: int, out_deg: int, dialect: str) -> str:
    """The identical edge list as a SQL relation (DuckDB oracle)."""
    if dialect == "duckdb":
        return (
            f"(SELECT range AS src, "
            f"((range * 2654435761) % 2147483648) // (1 + j) % {n} AS dst "
            f"FROM range({n}), UNNEST(generate_series(0, {out_deg - 1})) AS t(j))"
        )
    raise ValueError(dialect)


def pagerank_micro(
    edges: DataFrame,
    n: int,
    iters: int = 5,
    damping_milli: int = 850,
) -> DataFrame:
    """``iters`` rounds of the integer PageRank recurrence over nodes
    0..n-1 (every node assumed present as a source — `synth_links`
    guarantees it; dangling mass is therefore zero by construction)::

        r_0(v)   = MICRO
        r_{k+1}(v) = (1000 - d) * MICRO // 1000
                   + d * (Σ_{u→v} r_k(u) // deg(u)) // 1000

    All floor division — bit-identical across engines, partitionings,
    and summation orders (integer addition commutes exactly; float
    addition does not).  Returns (id, rank_micro).

    Scale shape: each round shuffles on ``dst`` only (partial sums
    combine map-side); degree is joined once, broadcast-sized per the
    optimizer; lineage truncated per round.
    """
    spark = edges.sparkSession
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = spark.range(n).select(
        F.col("id"), F.lit(MICRO).cast("long").alias("rank_micro")
    )
    for _ in range(iters):
        ranks = _rank_round(ed, ranks, n, damping_milli).localCheckpoint(
            eager=True
        )
    return ranks


def _rank_round(
    ed: DataFrame, ranks: DataFrame, n: int, damping_milli: int
) -> DataFrame:
    """ONE recurrence round, un-checkpointed — separate so tests can
    assert the plan shape (the checkpointed result is just an RDD scan
    and would hide a Window/UDF regression)."""
    base = (1000 - damping_milli) * MICRO // 1000
    contrib = (
        ed.join(ranks.withColumnRenamed("id", "src"), "src")
        # `div`, never `/`+cast: float division can land a hair
        # under the exact quotient and truncate to the wrong floor
        .selectExpr("dst AS id", "rank_micro div deg AS c")
        .groupBy("id")
        .agg(F.sum("c").alias("s"))
    )
    return (
        ed.sparkSession.range(n)
        .join(contrib, "id", "left")
        .selectExpr(
            "id",
            f"{base}L + ({damping_milli}L * coalesce(s, 0L)) div 1000"
            " AS rank_micro",
        )
    )

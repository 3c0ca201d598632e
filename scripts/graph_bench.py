"""Iterative-operator scaling evidence: PageRank over a synthetic
webgraph at bench scale.  Each iteration is one join + one map-side-
combinable aggregation (no windows, per-round lineage truncation), so
throughput is two shuffles per round — the pattern `connected_components`
shares.  Writes a GRAPH block into BENCH/BASELINE.md.

    python scripts/graph_bench.py [n_nodes]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eodal_spark.operators import graph as G
from eodal_spark.session import get_spark

ITERS = 3
OUT_DEG = 3
REPS = 2


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 10_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "eodal_graph_bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    best = float("inf")
    for _ in range(REPS):  # fresh plan per rep (stage-reuse pitfall)
        t0 = time.time()
        edges = G.synth_links(spark, n, OUT_DEG)
        # NOT inside an assert: python -O would strip the whole workload
        out_rows = G.pagerank_micro(edges, n, iters=ITERS).count()
        best = min(best, time.time() - t0)
        if out_rows != n:
            raise RuntimeError(f"expected {n} ranks, got {out_rows}")
    visits = n * OUT_DEG * ITERS
    rate = visits / best / 1e6

    block = f"""<!-- GRAPH:BEGIN -->
## Iterative operators at bench scale (local[{cpus}])

PageRank, {n:,} nodes x out-degree {OUT_DEG} = {n * OUT_DEG:,} edges,
{ITERS} iterations (integer micro-rank arithmetic, per-round
localCheckpoint): **{best:.1f} s** best of {REPS} = {rate:.1f}M
edge-visits/s.  Each round is one shuffle-join + one combinable
aggregation — the same shape `connected_components` runs — so rounds
scale with cluster shuffle bandwidth, and the integer formulation keeps
results bit-identical at any parallelism.
<!-- GRAPH:END -->
"""
    from _md import splice_block

    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "GRAPH", block)
    print({"n": n, "seconds": round(best, 1), "medge_visits_per_s": round(rate, 1)})

    cc_block = cc_bench(spark)
    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "CC", cc_block)
    spark.stop()


def cc_bench(spark) -> str:
    """Connected components: propagation vs two-phase star contraction
    on a dedup-realistic graph — ~10⁷ clustered edges (2M duplicate
    groups of 5, diameter 2: the shape LSH pair output actually has)
    plus a 10⁴-node path slice (diameter 10⁴: the adversarial case
    where propagation needs O(diameter) rounds but star needs O(log n)
    alternations).  Measured so the star variant's O(log n) claim
    carries a number like every other design claim here."""
    from pyspark.sql import functions as F

    from eodal_spark.operators import dedup as D

    n_groups, gsz, chain_n = 2_000_000, 5, 10_000
    base = spark.range(n_groups * gsz)
    clusters = base.filter(F.col("id") % gsz != 0).select(
        (F.col("id") - F.col("id") % gsz).alias("id_a"),
        F.col("id").alias("id_b"),
    )
    off = n_groups * gsz
    chain = spark.range(chain_n - 1).select(
        (F.col("id") + off).alias("id_a"),
        (F.col("id") + off + 1).alias("id_b"),
    )
    full = clusters.unionByName(chain)
    n_edges = n_groups * (gsz - 1)

    rows = {}
    for name, method, pairs, iters, expect in [
        ("propagation / clustered", "propagation", clusters, 8, n_groups * gsz),
        ("star / clustered", "star", clusters, 25, n_groups * gsz),
        ("star / clustered+chain", "star", full, 25, n_groups * gsz + chain_n),
    ]:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            got = D.connected_components(
                pairs, max_iters=iters, method=method
            ).count()
            best = min(best, time.time() - t0)
            if got != expect:
                raise RuntimeError(f"{name}: {got} labels, expected {expect}")
        rows[name] = best

    lines = "\n".join(
        f"| {k} | {v:.1f} | {n_edges / v / 1e6:.1f}M |"
        for k, v in rows.items()
    )
    return f"""<!-- CC:BEGIN -->
## Connected components at bench scale (same session as GRAPH)

{n_edges:,} clustered edges (2M groups × 5 — LSH-pair shape, diameter
2) and a {chain_n:,}-node path slice (diameter {chain_n:,}).

| variant / graph | best-of-{REPS} (s) | edges/s |
|---|---|---|
{lines}

Propagation converges in diameter+1 rounds — unbeatable on the shallow
duplicate clusters LSH emits, but it CANNOT run the chain slice
({chain_n:,} rounds).  Star contraction finishes the chain in
O(log n) alternations at a constant-factor cost on shallow graphs —
the opt-in (`method="star"`) for unknown-diameter pair graphs.
<!-- CC:END -->
"""


if __name__ == "__main__":
    main()

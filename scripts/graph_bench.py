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
    spark.stop()


if __name__ == "__main__":
    main()

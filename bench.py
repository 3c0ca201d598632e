"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): spatial-join + tile-assignment
throughput over the synthesized pages table — the full pipeline
html→text extraction → geocode → cell encode → broadcast polygon join →
tile assignment → mosaic dedup, measured as rows/sec end to end.

Also times the operator suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[N] parallelism (default 32)
  SPARK_GRAFT_BENCH_ROWS  pages rows for the headline job (default 40M)

Scaling evidence (north rule, N vs 4N): run
  SPARK_GRAFT_CPUS=8 python bench.py   and
  SPARK_GRAFT_CPUS=32 python bench.py
on the same input; scripts/scaling_bench.py automates both and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as E
from eodal_spark.operators import spatial_join as SJ
from eodal_spark.operators import tiling as TIL
from eodal_spark.session import get_spark
from eodal_spark.sources import pages as P

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 40M rows (~19 GB parquet) amortizes fixed job costs that dominate at
# 10M on 32 cores: measured 8.0M rows/s at 40M vs ~2.3-3.6M at 10M for
# the identical plan; materialization is one-time and untimed
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", str(40_000_000)))


def materialize_pages(spark, n_rows: int, path: str) -> str:
    """Write the synthesized pages table to parquet ONCE (not timed) —
    the bench then measures the engine over a stored table, the same
    shape a 100 TB Iceberg pages table has (BASELINE.json input_hint).
    Synthesizing inline instead would re-expand the generator expression
    tree into every derived column and measure codegen'd string
    synthesis, not the engine."""
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        P.synth_pages(spark, n_rows, partitions=CPUS * 4).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def headline_pipeline(spark, pages_path: str):
    """The north-rule job: scan → geocode → spatial join → tiles → dedup.

    Mosaic dedup runs at the page cell resolution (fine cells ≡ pixels
    in the reference's first-wins merge) — that is both the correct
    semantics and what keeps the dedup window's key space wide enough
    that city hotspots don't collapse into a few giant window
    partitions."""
    pages = spark.read.parquet(pages_path)
    geo = P.geocode(pages, E.RES)
    polys = E._polys_spark(spark)
    joined = SJ.spatial_join(
        geo, polys, E.JOIN_RES, rule="centroid",
        page_cols=("url", "warc_ts", "cell_id"), page_res=E.RES,
    )
    tiled = TIL.assign_tiles(joined, E.RES, E.TILE_RES)
    deduped = TIL.mosaic_dedup(tiled, keys=("cell_id", "ts_bucket"))
    return deduped


def scan_control(spark, pages_path: str):
    """Memory-bandwidth control: scan the same parquet and fold every
    html byte into one sum — near-zero compute per byte, so throughput
    is bounded by the storage/memory path, not the engine.  Comparing
    its N→4N efficiency against the headline's separates 'the node ran
    out of bandwidth' from 'the engine stopped scaling'."""
    pages = spark.read.parquet(pages_path)
    return pages.agg(F.sum(F.length("html")).alias("b"))


def main() -> None:
    spark = get_spark(
        "eodal_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS * 2, 32),
        # ~16MB scan splits => ~1200 tasks over the 19GB bench input =>
        # many task waves at 32 cores, amortizing stragglers. With the
        # default 128MB the last wave dominates wall-clock at high
        # parallelism (measured +85% throughput at local[32] from this
        # alone on the 10M-row input).
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    bench_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/eodal_spark_bench")
    pages_path = materialize_pages(
        spark, BENCH_ROWS, os.path.join(bench_dir, f"pages_{BENCH_ROWS}")
    )

    # warm the JVM/codegen + OS page cache so the headline measures
    # steady-state compute; best-of-N timed runs defend against the
    # sandbox VM's noisy-neighbor CPU steal
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    headline_pipeline(spark, pages_path).count()

    headline_sec, out_rows = float("inf"), 0
    for _ in range(repeats):
        t0 = time.time()
        out_rows = headline_pipeline(spark, pages_path).count()
        headline_sec = min(headline_sec, time.time() - t0)
    timings["headline_spatial_join_tiling"] = round(headline_sec, 3)
    rows_per_sec = BENCH_ROWS / headline_sec

    if "--headline-only" in sys.argv:
        # bandwidth control alongside the headline (same JVM, same input)
        scan_control(spark, pages_path).collect()
        scan_sec = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            scan_control(spark, pages_path).collect()
            scan_sec = min(scan_sec, time.time() - t0)
        print(
            json.dumps(
                {
                    "rows": BENCH_ROWS,
                    "output_rows": out_rows,
                    "seconds": round(headline_sec, 3),
                    "rows_per_sec": round(rows_per_sec),
                    "cpus": CPUS,
                    "scan_seconds": round(scan_sec, 3),
                    "scan_rows_per_sec": round(BENCH_ROWS / scan_sec),
                }
            )
        )
        spark.stop()
        return

    # bandwidth control for the FULL suite too (not just --headline-only):
    # the sandbox VM's CPU steal varies 1.8-5× between runs, and a
    # single-shot driver bench cannot otherwise distinguish "every query
    # regressed" from "the whole window was slow".  The control is a
    # near-zero-compute scan of the same parquet (storage/memory-path
    # bound), INTERLEAVED between suite queries (~1 s each): each query
    # is normalized by the mean of its two ADJACENT control probes, so
    # drift that moves DURING the run (measured 2.9× within one round-5
    # window) is attributed row-by-row instead of by argument.  The
    # endpoint probes still report the whole-window trend.
    scan_control(spark, pages_path).collect()  # warm
    controls: list[float] = []

    def probe_control() -> None:
        t0 = time.time()
        scan_control(spark, pages_path).collect()
        controls.append(time.time() - t0)

    for _ in range(repeats):  # endpoint probe: best-of-N like round 4
        probe_control()
    scan_before = min(controls)
    controls = [scan_before]

    # operator suite at the configured scale factor
    suite = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "events_sessions",
        "asof_join",
        "docs_exact_dedup",
        "docs_minhash_pairs",
        "emb_l2_topk",
        "spatial_join_exact",
        "spatial_join_holes",
        "spatial_join_buffered",
        "knn",
        "mosaic_dedup",
    ]
    qs = E.queries()
    normalized: dict[str, float] = {}
    for name in suite:
        best = float("inf")
        for _ in range(2):  # best-of-2: noisy-VM + python-worker warmup
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        probe_control()  # the probe AFTER this query / BEFORE the next
        local_ctl = (controls[-2] + controls[-1]) / 2
        normalized[name] = round(best / local_ctl, 2)

    scan_after = controls[-1]

    total = round(sum(timings.values()), 3)
    scan_sec = min(controls)
    print(
        json.dumps(
            {
                "metric": "spatial-join + tile-assignment bench",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "headline": {
                    "rows": BENCH_ROWS,
                    "output_rows": out_rows,
                    "seconds": round(headline_sec, 3),
                    "rows_per_sec": round(rows_per_sec),
                    "cpus": CPUS,
                },
                # in-run noise control: compare value_over_control /
                # headline_over_control ACROSS rounds — a noisy VM
                # window inflates numerator and denominator together.
                # `probes_sec` is the full interleaved series (one entry
                # before the suite + one after each query) so drift is
                # visible and attributable per row.
                "scan_control": {
                    "seconds": round(scan_sec, 3),
                    "before_sec": round(scan_before, 3),
                    "after_sec": round(scan_after, 3),
                    "probes_sec": [round(c, 3) for c in controls],
                    "rows_per_sec": round(BENCH_ROWS / scan_sec),
                },
                # per-query seconds / mean(adjacent control probes):
                # compare THESE across rounds — a drifting window
                # cancels out row-by-row
                "queries_over_control": normalized,
                "value_over_control": round(total / scan_sec, 2),
                "headline_over_control": round(headline_sec / scan_sec, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

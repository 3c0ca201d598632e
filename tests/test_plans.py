"""Physical-plan assertions — the 100 TB questions asked of .explain():
does the scan prune columns, do filters push down, does the big side
avoid shuffling, is the dedup aggregation partial, is codegen live."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from eodal_spark.operators import spatial_join as SJ
from eodal_spark.operators import tiling as TIL
from eodal_spark.sources import pages as P


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "pages.parquet")
    P.synth_pages(spark, 20_000).write.parquet(p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_reaches_scan(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).select("lang")
    plan = _plan(df)
    assert "ReadSchema: struct<lang:string>" in plan  # html never read


def test_filter_pushdown_reaches_scan(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).filter(F.col("lang") == "en")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)" in plan


def test_headline_has_single_data_shuffle(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    geo = P.geocode(pages, E.RES)
    joined = SJ.spatial_join(
        geo, E._polys_spark(spark), E.JOIN_RES, rule="centroid",
        page_cols=("url", "warc_ts", "cell_id"), page_res=E.RES,
    )
    deduped = TIL.mosaic_dedup(
        TIL.assign_tiles(joined, E.RES, E.TILE_RES),
        keys=("cell_id", "ts_bucket"),
    )
    # collect() executes THIS Dataset's queryExecution so AQE reports
    # the final plan (count() would wrap a new plan); drop the echoed
    # "Initial Plan" section before counting nodes
    deduped.collect()
    plan = _plan(deduped).split("== Initial Plan ==")[0]
    # big side joins via broadcast (no SortMergeJoin / no shuffle
    # before the join) …
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # … and the only data exchange is the dedup aggregation shuffle
    data_exchanges = [
        l for l in plan.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert len(data_exchanges) == 1, data_exchanges
    # the dedup agg combines map-side (partial_min before the exchange)
    assert "partial_min" in plan
    # the probe side runs inside whole-stage codegen (compact marker *(n))
    assert "*(" in plan


def test_geocode_has_no_python_stage(spark, pages_parquet):
    geo = P.geocode(spark.read.parquet(pages_parquet), E.RES)
    plan = _plan(geo)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan  # geocode is 100% JVM


def test_no_nullable_join_key_filter(spark, pages_parquet):
    """Regression: nullable cell_id used to make Catalyst infer
    isnotnull(key) and inline the regexp chain 4x into a pushed filter."""
    geo = P.geocode(spark.read.parquet(pages_parquet), E.RES)
    j = SJ.spatial_join(
        geo, E._polys_spark(spark), E.JOIN_RES, rule="centroid",
        page_res=E.RES,
    )
    assert "Filter isnotnull" not in _plan(j)


def test_knn_pages_side_not_shuffled(spark, pages_parquet):
    from eodal_spark.operators import knn as K

    geo = P.geocode(spark.read.parquet(pages_parquet), E.RES)
    # enough queries to stay above the tiny-set brute threshold — this
    # test pins the LADDER's plan shape (tiny sets short-circuit to the
    # brute pass, covered by test_knn_tiny_query_set_unprunable_goes_brute)
    rows = [
        (i, E.KNN_QUERIES[i % len(E.KNN_QUERIES)][1],
         E.KNN_QUERIES[i % len(E.KNN_QUERIES)][2])
        for i in range(600)
    ]
    q = spark.createDataFrame(rows, ["query_id", "lat_centi", "lon_centi"])
    out = K.knn(q, geo, E.RES, k=3)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan  # ring side broadcast, pages probe


def test_driver_cover_runs_zero_jobs(spark):
    """polygon_cover_cells over a polygons_df literal layer must run
    ZERO Spark jobs: the driver-built rows ride the DataFrame handle
    (_eodal_local_rows) so the cover is computed without the bounded
    limit-collect probe (which itself replaced a separate count job)."""
    from eodal_spark import geometry

    polys = E.geometry.polygons_df(spark, E.PAGE_POLYS)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    cover = geometry.polygon_cover_cells(polys, E.JOIN_RES)
    after = set(tracker.getJobIdsForGroup())
    assert len(after - before) == 0, sorted(after - before)
    assert cover.count() > 0  # cover itself is a local relation


def test_exact_spatial_join_single_pass_no_python(spark, pages_parquet):
    """Exact-rule refine is single-pass: ONE scan of the pages side,
    one broadcast join, no unions, and zero Python stages (convex
    min-cross + even-odd rings are both native Catalyst)."""
    geo = P.geocode(spark.read.parquet(pages_parquet), E.RES)
    polys = E.geometry.polygons_df(spark, E.HOLED_POLYS + [(9, E.PAGE_POLYS[0][1])])
    j = SJ.spatial_join(geo, polys, E.JOIN_RES, rule="exact", page_res=E.RES)
    plan = _plan(j)
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1, scans                    # pages scanned once
    assert "Union" not in plan                       # no 3-branch union
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan                    # refine is 100% JVM
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

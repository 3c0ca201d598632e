"""Mapper facade end-to-end — ≡ tests/mapper/test_mapper.py in the
reference (two-phase contract, filters, mosaic invariants)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eodal_spark.mapper import Mapper, MapperConfigs
from eodal_spark.operators.filters import Filter
from eodal_spark.sources.pages import synth_pages

ZURICH_BOX = [(7.0, 45.0), (10.0, 45.0), (10.0, 49.0), (7.0, 49.0)]


@pytest.fixture(scope="module")
def tiles_catalog(spark):
    rows = [
        # (tile_id, sensing_time, epsg, cloud, xmin, ymin, xmax, ymax)
        ("T1", "2019-05-10 00:00:00", 32632, 10.0, 6.0, 44.0, 9.0, 48.0),
        ("T2", "2019-06-10 00:00:00", 32632, 95.0, 8.0, 45.0, 11.0, 49.0),
        ("T3", "2019-06-15 00:00:00", 32633, 20.0, 100.0, 30.0, 110.0, 40.0),  # elsewhere
        ("T4", "2021-01-01 00:00:00", 32632, 5.0, 7.0, 45.0, 10.0, 49.0),  # out of time
    ]
    return spark.createDataFrame(
        rows,
        ["tile_id", "sensing_time", "epsg", "cloudy_pixel_percentage",
         "xmin", "ymin", "xmax", "ymax"],
    ).withColumn("sensing_time", F.to_timestamp("sensing_time"))


def _mapper(spark, pages, tiles, filters=None):
    cfg = MapperConfigs(
        collection="pages",
        feature=ZURICH_BOX,
        time_start="2019-05-01 00:00:00",
        time_end="2019-08-31 23:59:59",
        metadata_filters=filters or [],
    )
    return Mapper(cfg, pages, tiles)


def test_query_scenes_bbox_time_filters(spark, pages_small, tiles_catalog):
    m = _mapper(spark, pages_small, tiles_catalog)
    md = m.query_scenes().collect()
    assert [r["tile_id"] for r in md] == ["T1", "T2"]  # bbox+time pruned, sorted


def test_metadata_filters_cloud(spark, pages_small, tiles_catalog):
    m = _mapper(
        spark, pages_small, tiles_catalog,
        filters=[Filter("cloudy_pixel_percentage", "<", 90)],
    )
    md = m.query_scenes().collect()
    assert [r["tile_id"] for r in md] == ["T1"]


def test_load_scenes_clips_and_dedups(spark, pages_small, tiles_catalog):
    m = _mapper(spark, pages_small, tiles_catalog)
    m.query_scenes()  # catalog phase first (enforced)
    data = m.load_scenes().cache()
    assert data.count() > 0
    # all pages inside the feature bbox and time window
    bad = data.filter(
        (F.col("warc_ts") < "2019-05-01") | (F.col("warc_ts") > "2019-09-01")
    ).count()
    assert bad == 0
    # mosaic invariant: one row per (cell, ts_bucket)
    assert (
        data.groupBy("cell_id", "ts_bucket").count().filter("count > 1").count()
        == 0
    )


def test_extraction_requires_load(spark, pages_small, tiles_catalog):
    m = _mapper(spark, pages_small, tiles_catalog)
    with pytest.raises(ValueError):
        m.band_summaries()
    m.query_scenes()
    m.load_scenes()
    stats = m.band_summaries().first()
    assert stats["cnt"] > 0
    ts = m.get_feature_timeseries().collect()
    assert len(ts) > 1 and all(r["n"] > 0 for r in ts)


def test_mapper_timeseries_reindex(spark, pages_small, tiles_catalog):
    """reindex=True completes the bucket axis (scene.py:532-539
    generalized): consecutive buckets, zero-filled gap counts,
    forward-filled measurements, is_observed marking real rows."""
    m = _mapper(spark, pages_small, tiles_catalog)
    m.query_scenes()
    m.load_scenes()
    sparse = m.get_feature_timeseries().collect()
    dense = m.get_feature_timeseries(reindex=True).collect()
    buckets = [r["ts_bucket"] for r in dense]
    assert buckets == list(range(min(buckets), max(buckets) + 1))
    assert len(dense) >= len(sparse)
    assert sum(1 for r in dense if r["is_observed"]) == len(sparse)
    assert all(r["n"] == 0 and r["avg_chars"] is not None
               for r in dense if not r["is_observed"]) or len(dense) == len(sparse)


def test_many_footprints_use_semi_join_same_answer(spark, pages_small, monkeypatch):
    """Above the OR-chain cutoff the footprint restriction switches to a
    broadcast left-semi range join — same rows, bounded expression tree
    (a thousand-scene catalog must not blow up Catalyst analysis)."""
    import eodal_spark.mapper as MOD

    # 9×9 grid of overlapping tiles over the Zürich box (81 footprints)
    rows = []
    for i in range(9):
        for j in range(9):
            rows.append(
                (f"t{i}_{j}", "2019-06-01 00:00:00", 4326, 10.0,
                 7.0 + i * 0.4, 45.0 + j * 0.5, 7.0 + i * 0.4 + 0.5, 45.0 + j * 0.5 + 0.6)
            )
    tiles = spark.createDataFrame(
        rows,
        ["tile_id", "sensing_time", "epsg", "cloudy_pixel_percentage",
         "xmin", "ymin", "xmax", "ymax"],
    ).withColumn("sensing_time", F.to_timestamp("sensing_time"))

    def load(cutoff):
        monkeypatch.setattr(MOD, "_MAX_OR_FOOTPRINTS", cutoff)
        m = _mapper(spark, pages_small, tiles)
        m.query_scenes()
        return {
            tuple(r) for r in m.load_scenes().select("url", "cell_id").collect()
        }

    via_or = load(1000)   # literal OR path
    via_semi = load(4)    # forced semi-join path
    assert via_or == via_semi and len(via_or) > 0


def test_mapper_accepts_wkt_feature(spark, pages_small):
    """MapperConfigs.feature takes any polygonal form — a holed WKT AOI
    queries and loads like a bare ring (feature.py:130-194 parity)."""
    from eodal_spark.mapper import Mapper, MapperConfigs

    wkt = ("POLYGON ((6.5 44.5, 10.5 44.5, 10.5 49.5, 6.5 49.5, 6.5 44.5), "
           "(8.0 46.0, 9.5 46.0, 9.5 48.0, 8.0 48.0, 8.0 46.0))")
    cfg = MapperConfigs(
        collection="pages", feature=wkt,
        time_start="2019-05-01 00:00:00", time_end="2019-08-31 23:59:59",
    )
    m = Mapper(cfg, pages_small)
    out = m.load_scenes()
    assert out.count() > 0


def test_load_requires_query_and_metadata_restricts_pixels(
    spark, pages_small, tiles_catalog
):
    """Query-before-load is enforced when a catalog is attached, and
    metadata filters restrict the LOADED pixels to the queried scenes'
    footprints (not just the catalog listing)."""
    m = _mapper(spark, pages_small, tiles_catalog)
    with pytest.raises(ValueError, match="query_scenes"):
        m.load_scenes()
    # cloud filter keeps only T1 (bbox lon 6..9): loaded pages must all
    # fall inside T1's footprint even though the feature extends to 10
    m2 = _mapper(
        spark, pages_small, tiles_catalog,
        filters=[Filter("cloudy_pixel_percentage", "<", 90)],
    )
    m2.query_scenes()
    data = m2.load_scenes()
    assert data.count() > 0
    # every surviving page's own lon (parseable from its text) must lie
    # inside T1's footprint (lon <= 9) — T2 (lon 8..11) was filtered out
    from eodal_spark.sources.pages import parse_geo

    _, _, _, lon = parse_geo(F.col("text"))
    assert data.filter(lon > 9.0).count() == 0
    # sanity: without the metadata filter the same area DOES have pages
    m3 = _mapper(spark, pages_small, tiles_catalog)
    m3.query_scenes()
    _, _, _, lon3 = parse_geo(F.col("text"))
    assert m3.load_scenes().filter(lon3 > 9.0).count() > 0

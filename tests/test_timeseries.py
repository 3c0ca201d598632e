"""Time-series reindex/gap-fill (≡ `eodal/core/scene.py:472-539`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eodal_spark.operators import timeseries as TS


def _fixture(spark):
    # poly 1 observed at buckets 2,5; poly 2 at 3 — spine must be 2..5
    rows = [
        (1, 2, 4, 100),
        (1, 5, 2, 200),
        (2, 3, 1, 300),
    ]
    return spark.createDataFrame(rows, ["poly_id", "ts_bucket", "n", "v"])


def test_reindex_completes_spine_and_fills(spark):
    out = TS.reindex_buckets(
        _fixture(spark), "poly_id", "ts_bucket",
        fill_zero=("n",), fill_forward=("v",),
    )
    got = {
        (r["poly_id"], r["ts_bucket"]): (r["n"], r["v"], r["is_observed"])
        for r in out.collect()
    }
    assert len(got) == 2 * 4  # 2 keys × buckets 2..5
    assert got[(1, 2)] == (4, 100, True)
    assert got[(1, 3)] == (0, 100, False)   # gap: n zero, v carried
    assert got[(1, 4)] == (0, 100, False)
    assert got[(1, 5)] == (2, 200, True)
    assert got[(2, 2)] == (0, None, False)  # before first obs: v stays NULL
    assert got[(2, 3)] == (1, 300, True)
    assert got[(2, 5)] == (0, 300, False)


def test_reindex_matches_duckdb_twin(spark):
    import duckdb

    rows = [(p, b, (p * 3 + b) % 5, p * 10 + b) for p in (1, 2, 3) for b in (1, 4, 9, 11)]
    df = spark.createDataFrame(rows, ["poly_id", "ts_bucket", "n", "v"])
    got = sorted(map(tuple, TS.reindex_buckets(
        df, "poly_id", "ts_bucket", fill_zero=("n",), fill_forward=("v",)
    ).collect()))
    vals = ", ".join(f"({p}, {b}, {n}, {v})" for p, b, n, v in rows)
    exp = sorted(map(tuple, duckdb.sql(TS.sql_reindex_buckets(
        f"(SELECT * FROM (VALUES {vals}) t(poly_id, ts_bucket, n, v))",
        "poly_id", "ts_bucket", ("n", "v"),
        fill_zero=("n",), fill_forward=("v",),
    )).fetchall()))
    assert got == exp




def _stack_df(spark):
    # two cells × two buckets; cell 1/bucket 0 has an even stack (median .5)
    rows = [
        (1, 10, 100, "a"), (1, 20, 104, "b"), (1, 30, 101, "c"),
        (1, 40, 109, "d"),                       # median 102.5
        (1, 3600, 50, "e"),                      # lone obs in bucket 1
        (2, 15, 7, "f"), (2, 25, 7, "g"), (2, 35, 9, "h"),  # median 7
    ]
    return spark.createDataFrame(rows, ["cell", "ts", "v", "obs_id"])


def test_temporal_composite_stats(spark):
    from eodal_spark.operators.timeseries import temporal_composite

    out = {
        (r.cell_id, r.ts_bucket): r
        for r in temporal_composite(_stack_df(spark), "cell", "ts", "v", 3600).collect()
    }
    r = out[(1, 0)]
    assert (r.n_obs, r.v_min, r.v_max) == (4, 100, 109)
    assert r.v_median == 102.5
    assert r.v_mean_milli == (100 + 104 + 101 + 109) * 1000 // 4
    assert out[(1, 1)].v_median == 50.0
    assert out[(2, 0)].v_median == 7.0


def test_medoid_composite_picks_observation_nearest_median(spark):
    from eodal_spark.operators.timeseries import medoid_composite

    out = {
        (r.cell_id, r.ts_bucket): (r.obs_id, r.v_medoid)
        for r in medoid_composite(
            _stack_df(spark), "cell", "ts", "v", 3600, id_col="obs_id"
        ).collect()
    }
    # stack {100,104,101,109}, median 102.5 → |101-102.5|=1.5 beats |104|=1.5?
    # both are 1.5 → tie broken by smaller v ⇒ 101 ("c")
    assert out[(1, 0)] == ("c", 101)
    assert out[(1, 1)] == ("e", 50)
    # stack {7,7,9} median 7 → two obs at distance 0, tie → smaller obs_id "f"
    assert out[(2, 0)] == ("f", 7)

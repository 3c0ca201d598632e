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



"""kNN: ring-expansion must equal brute force row-for-row (total-order
tie-break ⇒ unique answer). Generalizes `eodal/core/band.py:1431-1454`."""

from __future__ import annotations

import pytest

from eodal_spark.operators import knn as K
from eodal_spark.sources import pages as P

RES = 8


@pytest.fixture(scope="module")
def pages_geo(spark, pages_small):
    return P.geocode(pages_small, RES).cache()


@pytest.fixture(scope="module")
def queries(spark):
    # dense hotspot, background, empty-region (forces brute-force path)
    rows = [
        (1, 13737, 18854),   # Zürich center
        (2, 13070, 10600),   # NYC center
        (3, 9000, 18000),    # background
        (4, 500, 100),       # near south pole — empty region
        (5, 12570, 31970),   # Tokyo
    ]
    return spark.createDataFrame(rows, ["query_id", "lat_centi", "lon_centi"])


def test_ring_knn_matches_brute_force(pages_geo, queries):
    k = 7
    ring = (
        K.knn(queries, pages_geo, RES, k)
        .orderBy("query_id", "rank")
        .collect()
    )
    brute = (
        K.knn_brute(queries, pages_geo, k)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert len(ring) == len(brute) == 5 * k
    for a, b in zip(ring, brute):
        assert (a["query_id"], a["rank"], a["url"], a["sqdist"]) == (
            b["query_id"], b["rank"], b["url"], b["sqdist"]
        )


def test_knn_matches_duckdb_oracle(spark, queries):
    import duckdb

    k = 5
    n = 10_000
    q_rows = queries.collect()
    qsql = " UNION ALL ".join(
        f"SELECT {r['query_id']} AS query_id, {r['lat_centi']} AS q_lat, "
        f"{r['lon_centi']} AS q_lon"
        for r in q_rows
    )
    expect = duckdb.sql(
        f"""
        SELECT query_id, url, sqdist, rank FROM (
          SELECT q.query_id, p.url,
                 (p.lat_centi - q.q_lat) * (p.lat_centi - q.q_lat)
               + least(abs(p.lon_centi - q.q_lon), 36000 - abs(p.lon_centi - q.q_lon))
               * least(abs(p.lon_centi - q.q_lon), 36000 - abs(p.lon_centi - q.q_lon)) AS sqdist,
                 row_number() OVER (PARTITION BY q.query_id
                                    ORDER BY sqdist, p.url) AS rank
          FROM {P.sql_pages_subquery(n, "duckdb")} p, ({qsql}) q
        ) WHERE rank <= {k} ORDER BY query_id, rank
        """
    ).df()
    geo = P.geocode(P.synth_pages(spark, n), RES)
    got = (
        K.knn(queries, geo, RES, k)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    assert (got["url"].to_numpy() == expect["url"].to_numpy()).all()
    assert (got["sqdist"].to_numpy() == expect["sqdist"].to_numpy()).all()


def test_knn_escalation_resolves_sparse_without_brute(spark):
    """A query one ring-doubling away from its neighbours must resolve
    in an ESCALATED ring pass — never via the brute-force fallback (the
    plan must stay CartesianProduct-free), matching brute row-for-row."""
    from eodal_spark import grid as GR
    from pyspark.sql import functions as F

    # res 8: cell height 70.3, width 140.6 centi-deg.  Neighbours sit
    # 500 centi-deg east: outside the radius-2 disk (round 1 empty),
    # inside the radius-4 disk but past its provable bound (281.25²),
    # provably resolved by the radius-8 disk (bound 562.5² > 500²+14²).
    rows = [(100 + i, 18000 + 500, 9000 + 7 * i) for i in range(4)]
    pages = spark.createDataFrame(rows, ["url", "lon_centi", "lat_centi"])
    pages = pages.withColumn(
        "cell_id",
        F.expr(GR.sql_cell_encode_centi("lon_centi", "lat_centi", RES, "spark")),
    )
    q = spark.createDataFrame([(1, 9000, 18000)], ["query_id", "lat_centi", "lon_centi"])
    out = K.knn(q, pages, RES, k=3, start_radius=2, max_rounds=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    got = out.orderBy("rank").collect()
    brute = K.knn_brute(q, pages, k=3).orderBy("rank").collect()
    assert [(r["url"], r["sqdist"]) for r in got] == [
        (r["url"], r["sqdist"]) for r in brute
    ]


def test_knn_dense_first_round_plan_has_no_cartesian(pages_geo, spark):
    """All-dense queries resolve in round one: the returned plan must be
    the broadcast ring join only — no CartesianProduct fallback branch."""
    q = spark.createDataFrame(
        [(1, 13737, 18854), (2, 13070, 10600)],
        ["query_id", "lat_centi", "lon_centi"],
    )
    out = K.knn(q, pages_geo, RES, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_knn_wraps_date_line(spark):
    """A query at lon ≈ +179.99 must find pages just across ±180° as
    nearest — wrapped dlon, not the 36000-centi-degree raw difference."""
    from eodal_spark import grid as GR
    from pyspark.sql import functions as F

    rows = [
        # (url, lon_centi, lat_centi): two pages hugging the line's west
        # side (lon ≈ -179.99 → lon_centi 1, 3), one far away eastward
        (100, 1, 9000),
        (101, 3, 9000),
        (102, 30000, 9000),
    ]
    pages = spark.createDataFrame(rows, ["url", "lon_centi", "lat_centi"])
    pages = pages.withColumn(
        "cell_id",
        F.expr(GR.sql_cell_encode_centi("lon_centi", "lat_centi", RES, "spark")),
    )
    q = spark.createDataFrame([(1, 9000, 35999)], ["query_id", "lat_centi", "lon_centi"])
    got = K.knn(q, pages, RES, k=2).orderBy("rank").collect()
    assert [r["url"] for r in got] == [100, 101]
    assert got[0]["sqdist"] == 2 * 2   # |35999-1| wraps to 2
    assert got[1]["sqdist"] == 4 * 4
    # brute path agrees
    brute = K.knn_brute(q, pages, k=2).orderBy("rank").collect()
    assert [(r["url"], r["sqdist"]) for r in got] == [
        (r["url"], r["sqdist"]) for r in brute
    ]

"""kNN via cell-ring expansion.

The reference only supports k=1 nearest-cell snapping via a per-point
argmin loop (`eodal/core/band.py:1431-1454`, loop :1460-1473); the
north rule requires general kNN.  Algorithm:

1. encode each query point to its cell; explode the Chebyshev ring of
   radius r around it (`grid.cell_ring`) — a small broadcast side;
2. equi-join pages on ``cell_id`` (broadcast-hash: the big side never
   shuffles), compute the squared equirectangular distance;
3. rank per query (``row_number`` ordered by distance, tie-broken by
   url — total order ⇒ deterministic under any parallelism);
4. queries whose k-th distance is not provably inside the searched disk
   (kth_dist > r·cell_height) escalate to radius 2r, 4r, … — each round
   re-joins ONLY the unresolved queries; after ``max_rounds`` doublings
   the remainder falls back to a brute-force broadcast scan (correct
   for any density, including empty regions).

Distance is **squared centi-degree distance** — pure integer/float
arithmetic with no transcendentals, so rankings are bit-identical
across engines (the DuckDB oracle brute-forces the same metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eodal_spark import grid


def _ranked(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("sqdist").asc(), F.col("url").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _sqdist() -> F.Column:
    # longitude wraps at ±180°: the ring explodes wrapped cells
    # (grid.cell_ring pmods x), so the metric must wrap too or
    # candidates pulled across the date line get inflated distances
    dlat = F.col("lat_centi") - F.col("q_lat_centi")
    adlon = F.abs(F.col("lon_centi") - F.col("q_lon_centi"))
    dlon = F.least(adlon, F.lit(36000) - adlon)
    return (dlat * dlat + dlon * dlon).cast("long")


def _cell_id_is_stored(df: DataFrame) -> bool:
    """True iff ``cell_id`` is a physical column of a leaf relation
    (parquet/Iceberg scan), not an expression computed above it.

    Decides whether the ring rounds add their disk-range scan predicate:
    on a stored column the OR-of-BETWEEN pushes to row-group stats and a
    round reads a sliver; on a COMPUTED column (e.g. straight out of
    `pages.geocode`) predicate pushdown would substitute the full
    deriving expression into every comparison — measured 5-10× slower —
    while the broadcast hash join already evaluates it exactly once per
    row, so the prefilter is pure loss there."""
    leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
    for i in range(leaves.length()):
        out = leaves.apply(i).output()
        for j in range(out.length()):
            if out.apply(j).name() == "cell_id":
                return True
    return False


def knn(
    queries: DataFrame,
    pages_geo: DataFrame,
    res: int,
    k: int,
    start_radius: int = 2,
    max_rounds: int = 3,
    scan_prune: bool | None = None,
) -> DataFrame:
    """``queries``: (query_id, lat_centi, lon_centi). ``pages_geo``:
    geocoded pages with cell_id, lat_centi, lon_centi, url.
    Returns (query_id, url, sqdist, rank), rank 1..k.

    Ring escalation — at most ``max_rounds`` ring passes plus one
    bounded brute fallback; every pass re-joins ONLY the still-
    unresolved queries, so a sparse-region query never drags resolved
    ones back over the pages side:

    1. round i explodes the radius ``start_radius·2^i`` Chebyshev disk
       of each unresolved query (broadcast), equi-joins on cell_id (the
       big side never shuffles) — and the same disks, planned as
       OR-of-BETWEEN cell_id ranges (`grid.cell_disk_ranges`), pre-
       filter the pages scan, so on a cell-sorted table each round
       reads only the row groups overlapping the disks; ranks; a query
       is *resolved* when it has k candidates whose k-th distance is
       provably inside the searched disk (kth ≤ (r·cell_height)²);
    2. the per-query resolution stats (≤ |queries| rows/round) come
       back to the driver to drive the escalation;
    3. queries still unresolved after ``max_rounds`` doublings fall
       back to ONE brute-force broadcast scan — correct for any
       density including empty regions, and at 10^12 rows only the
       (rare) truly-isolated queries ever pay for it.
    """
    q = queries.select(
        "query_id",
        F.col("lat_centi").alias("q_lat_centi"),
        F.col("lon_centi").alias("q_lon_centi"),
        F.expr(
            grid.sql_cell_encode_centi("lon_centi", "lat_centi", res, "spark")
        ).alias("q_cell"),
    )
    pages_side = pages_geo.select("cell_id", "url", "lat_centi", "lon_centi")
    # cell height in centi-degrees: any point outside the radius-r disk
    # is at least r*height away (height <= width on this grid)
    cell_h_centi = 18000.0 / (1 << res)

    if scan_prune is None:
        scan_prune = _cell_id_is_stored(pages_geo)
    q_cells = {
        r["query_id"]: r["q_cell"]
        for r in q.select("query_id", "q_cell").collect()
    }
    unresolved = sorted(q_cells)
    results: DataFrame | None = None
    n_cells = 1 << res
    for i in range(max_rounds):
        if not unresolved:
            break
        radius = start_radius << i
        bound = (radius * cell_h_centi) ** 2
        rest_q = q.filter(F.col("query_id").isin(unresolved))
        ring = rest_q.select(
            "query_id", "q_lat_centi", "q_lon_centi",
            F.explode(grid.cell_ring("q_cell", radius, res)).alias("cell_id"),
        )
        # scan-level pruning: the SAME disk cells the ring explodes,
        # planned as OR-of-BETWEEN cell_id ranges and pushed into the
        # pages scan — on a cell-sorted table a ring re-join touches a
        # sliver of the corpus (row-group min/max skipping), not a full
        # pass.  None (too many ranges) skips the prefilter: the join
        # alone is still correct, Catalyst just can't get a bounded
        # literal tree.
        ranges = (
            grid.cell_disk_ranges(
                [q_cells[qid] for qid in unresolved], radius, res
            )
            if scan_prune
            else None
        )
        round_pages = pages_side
        if ranges:
            round_pages = pages_side.filter(
                grid.ranges_predicate("cell_id", ranges)
            )
        cand = round_pages.join(F.broadcast(ring), "cell_id", "inner")
        topk = _ranked(cand.withColumn("sqdist", _sqdist()), k).select(
            "query_id", "url", "sqdist", "rank"
        )
        topk = topk.cache()  # tiny: ≤ |unresolved|·k rows, reused below
        stats = topk.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n"), F.max("sqdist").alias("kth")
        ).collect()
        resolved = {
            r["query_id"] for r in stats if r["n"] == k and r["kth"] <= bound
        }
        if 2 * radius + 1 >= n_cells:
            # x wraps, so the disk spans every x column — but y CLAMPS,
            # so full grid coverage additionally needs
            # radius >= max(y, n-1-y) per query (an equator query covers
            # everything at n/2; a polar one only at n-1).  Only then is
            # there provably nothing more to find.
            for r in stats:
                y_q = q_cells[r["query_id"]] & ((1 << 29) - 1)
                if radius >= max(y_q, n_cells - 1 - y_q):
                    resolved.add(r["query_id"])
        if resolved:
            part = topk.filter(F.col("query_id").isin(list(resolved)))
            results = part if results is None else results.unionByName(part)
        unresolved = sorted(set(unresolved) - resolved)

    if unresolved:
        rest = q.filter(F.col("query_id").isin(unresolved)).select(
            "query_id", "q_lat_centi", "q_lon_centi"
        )
        cand = pages_side.crossJoin(F.broadcast(rest))
        brute = _ranked(cand.withColumn("sqdist", _sqdist()), k).select(
            "query_id", "url", "sqdist", "rank"
        )
        results = brute if results is None else results.unionByName(brute)
    if results is None:  # no queries at all
        return _ranked(
            pages_side.crossJoin(F.broadcast(q.limit(0))).withColumn(
                "sqdist", _sqdist()
            ),
            k,
        ).select("query_id", "url", "sqdist", "rank")
    return results.select("query_id", "url", "sqdist", "rank")


def knn_brute(queries: DataFrame, pages_geo: DataFrame, k: int) -> DataFrame:
    """Reference brute-force kNN (the baseline the ring version must
    match row-for-row — and the shape of the DuckDB oracle)."""
    q = queries.select(
        "query_id",
        F.col("lat_centi").alias("q_lat_centi"),
        F.col("lon_centi").alias("q_lon_centi"),
    )
    cand = pages_geo.select("url", "lat_centi", "lon_centi").crossJoin(
        F.broadcast(q)
    )
    return _ranked(cand.withColumn("sqdist", _sqdist()), k).select(
        "query_id", "url", "sqdist", "rank"
    )

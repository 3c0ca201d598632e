"""Real-geometry workflow: WKT/WKB layers with holes and multi-part
polygons, exact spatial join, buffered (within-distance) join, and a
labeled nd-array export — the engine's equivalent of the reference's
vector-feature pipeline (`eodal/mapper/feature.py` + clipped reads).

    python examples/real_geometry_layers.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eodal_spark import geometry, grid
from eodal_spark.operators import export, spatial_join
from eodal_spark.session import get_spark
from eodal_spark.sources import pages

spark = get_spark("example_geometry")
spark.sparkContext.setLogLevel("ERROR")

RES, JOIN_RES = 12, 8

# a holed AOI (ring road with an exclusion zone) + a two-part archipelago,
# straight from WKT — holes and MultiPolygons are first-class
layer = geometry.polygons_df(
    spark,
    [
        (1, "POLYGON ((6.5 44.5, 10.5 44.5, 10.5 49.5, 6.5 49.5, 6.5 44.5), "
            "(8.0 46.0, 9.5 46.0, 9.5 48.0, 8.0 48.0, 8.0 46.0))"),
        (2, "MULTIPOLYGON (((-75.5 39.0, -72.5 39.5, -74.0 42.5, -75.5 39.0)), "
            "((138.0 34.0, 142.0 34.5, 140.0 37.8, 138.0 34.0)))"),
    ],
)

geo = pages.geocode(pages.synth_pages(spark, 50_000), RES)

# exact membership: even-odd over all rings, fully native (no Python)
exact = spatial_join.spatial_join(
    geo, layer, JOIN_RES, rule="exact", page_res=RES
)
print("exact join (hole excluded):")
exact.groupBy("poly_id").count().orderBy("poly_id").show()

# within ~2 cells of either polygon: buffer the covering, not the data
cover = geometry.polygon_cover_cells(layer, JOIN_RES, mode="centroid")
buffered = geometry.buffer_cells(cover.select("poly_id", "cell_id"), 2, JOIN_RES)
near = geo.withColumn(
    "_join_cell", grid.cell_parent("cell_id", RES, JOIN_RES)
).join(
    F.broadcast(buffered.withColumnRenamed("cell_id", "_join_cell")), "_join_cell"
)
print("buffered join (pages within ~2 cells):")
near.groupBy("poly_id").count().orderBy("poly_id").show()

# labeled export of per-cell page counts over the AOI (to_xarray twin)
aoi_counts = (
    exact.filter("poly_id = 1")
    .groupBy(F.col("join_cell").alias("cell_id"))
    .agg(F.count(F.lit(1)).alias("n_pages"))
)
lab = export.to_labeled(aoi_counts, ("n_pages",), JOIN_RES)
print(
    "labeled grid:", lab["data"]["n_pages"].shape,
    "lon range", round(float(lab["coords"]["lon"].min()), 2),
    "…", round(float(lab["coords"]["lon"].max()), 2),
)
spark.stop()

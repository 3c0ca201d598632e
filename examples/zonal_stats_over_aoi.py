"""Zonal statistics over an area of interest — the engine's equivalent
of the reference's `examples/satellite_archives.py` / band_summaries
workflow: define polygons, clip the pages table to them, aggregate.

    python examples/zonal_stats_over_aoi.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eodal_spark import geometry
from eodal_spark.operators import spatial_join, zonal
from eodal_spark.session import get_spark
from eodal_spark.sources import pages

RES, JOIN_RES = 12, 8

spark = get_spark("example_zonal")
spark.sparkContext.setLogLevel("ERROR")

# 1. the base relation (production: spark.read.format("iceberg")...)
geo = pages.geocode(pages.synth_pages(spark, 100_000), RES)
geo = geo.withColumn("n_chars", F.length("text"))

# 2. an AOI polygon layer (production: read from any vector source)
aoi = geometry.polygons_df(
    spark,
    [(1, [(5.0, 44.0), (11.0, 44.0), (11.0, 49.5), (5.0, 49.5)]),   # Alps-ish
     (2, [(-80.0, 38.0), (-70.0, 38.0), (-70.0, 43.0), (-80.0, 43.0)])],  # US-NE
    attrs={1: {"name": "central_europe"}, 2: {"name": "us_northeast"}},
)

# 3. clip + reduce — one lazy plan, one broadcast join, one aggregation
joined = spatial_join.spatial_join(
    geo, aoi, JOIN_RES, rule="centroid",
    page_cols=("url", "n_chars"), page_res=RES,
)
stats = zonal.zonal_stats(joined, "n_chars", keep_empty=True, polys=aoi)
stats.show(truncate=False)
spark.stop()

"""The Mapper two-phase workflow — the engine's equivalent of the
reference's flagship `MapperConfigs → query_scenes → load_scenes`
pipeline (eodal examples/mapper_usage): catalog query, clipped load,
per-feature time series.

    python examples/mapper_timeseries.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eodal_spark.mapper import Mapper, MapperConfigs
from eodal_spark.operators.filters import Filter
from eodal_spark.session import get_spark
from eodal_spark.sources import pages

spark = get_spark("example_mapper")
spark.sparkContext.setLogLevel("ERROR")

tiles = spark.createDataFrame(
    [("T32TMT", "2019-06-01 00:00:00", 32632, 12.5, 7.0, 45.0, 10.0, 49.0)],
    ["tile_id", "sensing_time", "epsg", "cloudy_pixel_percentage",
     "xmin", "ymin", "xmax", "ymax"],
).withColumn("sensing_time", F.to_timestamp("sensing_time"))

configs = MapperConfigs(
    collection="pages",
    feature=[(7.0, 45.0), (10.0, 45.0), (10.0, 49.0), (7.0, 49.0)],
    time_start="2019-05-01 00:00:00",
    time_end="2019-08-31 23:59:59",
    metadata_filters=[Filter("cloudy_pixel_percentage", "<", 80)],
)

mapper = Mapper(configs, pages.synth_pages(spark, 100_000), tiles)
print("catalog hits:", mapper.query_scenes().count())
mapper.load_scenes()
mapper.get_feature_timeseries().show()
spark.stop()

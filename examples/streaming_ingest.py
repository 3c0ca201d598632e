"""Streaming ingest workflow: a pages stream → watermarked windowed
counts and a stateful first-wins mosaic, drained with availableNow and
checkpointed — the incremental twin of the batch headline pipeline.

    python examples/streaming_ingest.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eodal_spark.session import get_spark
from eodal_spark.sources import pages
from eodal_spark.streaming import ingest

spark = get_spark("example_streaming")
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="eodal_stream_")
src = os.path.join(work, "incoming")

# two "arrivals" → two micro-batches (maxFilesPerTrigger=1), so state
# genuinely carries across batches
pages.synth_pages(spark, 5_000).write.parquet(src)
pages.synth_pages(spark, 8_000).filter("url LIKE '%3'").write.mode(
    "append"
).parquet(src)

stream = (
    spark.readStream.schema(spark.read.parquet(src).schema)
    .option("maxFilesPerTrigger", "1")
    .parquet(src)
)

# stateful first-wins mosaic: emits only when a key's winner changes
mosaic = ingest.streaming_mosaic_dedup(stream, res=8)
q = (
    mosaic.writeStream.format("memory").queryName("mosaic")
    .outputMode("update")
    .option("checkpointLocation", os.path.join(work, "chk_mosaic"))
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
out = spark.table("mosaic")
print("mosaic emissions:", out.count(), "distinct keys:",
      out.select("cell_id", "ts_bucket").distinct().count())

# watermarked tumbling windows over the same stream
stream2 = (
    spark.readStream.schema(spark.read.parquet(src).schema)
    .option("maxFilesPerTrigger", "1")
    .parquet(src)
)
counts = ingest.windowed_cell_counts(stream2, res=6, window="7 days",
                                     watermark="1 day")
q2 = (
    counts.writeStream.format("memory").queryName("win_counts")
    .outputMode("update")
    .option("checkpointLocation", os.path.join(work, "chk_win"))
    .trigger(availableNow=True)
    .start()
)
q2.awaitTermination()
print("windowed cell-count rows:", spark.table("win_counts").count())
spark.stop()

"""CSV directory scan with filename-date pruning — `stack_dataframes`.

The reference globs a CSV directory, parses a date out of each
filename, skips files outside [start, end], reads the rest with pandas
and concats (`eodal/utils/stacking.py:29-69`).  Spark-first version:
one ``spark.read.csv`` over the pruned file list + ``input_file_name``
-derived date column — the prune happens before any I/O, like the
reference, but the read is distributed.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FILENAME_DATE_RE = re.compile(r"(\d{4})-(\d{2})-(\d{2})")


def filename_date(path: str) -> dt.date | None:
    m = FILENAME_DATE_RE.search(os.path.basename(path))
    if not m:
        return None
    return dt.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))


def stack_csv(
    spark: SparkSession,
    in_dir: str,
    start: dt.date,
    end: dt.date,
    pattern: str = "*.csv",
) -> DataFrame:
    """Read every CSV in ``in_dir`` whose filename date ∈ [start, end]
    into one DataFrame, tagged with its ``file_date``.

    ≡ stacking.py:47-61 (date parse + prune) and :69 (concat → union).
    """
    files = sorted(glob.glob(os.path.join(in_dir, pattern)))
    keep = [f for f in files if (d := filename_date(f)) and start <= d <= end]
    if not keep:
        raise FileNotFoundError(
            f"no {pattern} in {in_dir} within [{start}, {end}]"
        )
    df = spark.read.option("header", True).option("inferSchema", True).csv(keep)
    # date from the BASENAME (the same string filename_date pruned on) —
    # a dated directory component would otherwise win the regex match
    base = F.element_at(F.split(F.input_file_name(), "/"), -1)
    date_str = F.regexp_extract(base, r"(\d{4}-\d{2}-\d{2})", 1)
    return df.withColumn("file_date", F.to_date(date_str))

"""eodal_spark — a PySpark-native spatial-join + tiling analytics engine.

A from-scratch reimplementation of the query and data-processing semantics
of EODAL (EOA-team/eodal, reference snapshot at /root/reference) as an
idiomatic Apache Spark engine:

* the raster pixel grid (``eodal/core/band.py:151-256`` GeoInfo affine
  indexing) becomes a hierarchical discrete global grid whose ``cell_id``
  is computed by pure Catalyst Column arithmetic (``eodal_spark.grid``);
* vector features (``eodal/mapper/feature.py``) become small broadcast
  DataFrames of polygon rings (``eodal_spark.geometry``);
* clipping / masking / zonal statistics (``eodal/core/band.py:1197-1340``,
  ``:2049-2203``) become broadcast spatial joins + groupBy aggregations
  (``eodal_spark.operators``);
* the Mapper mosaic pipeline (``eodal/mapper/mapper.py:471-792``) becomes
  tile assignment + first-wins window dedup (``eodal_spark.operators.tiling``).

Everything is lazy DataFrame algebra: Catalyst fuses the projections,
pushes the predicates into the parquet scan, and AQE handles skew.
"""

__version__ = "0.1.0"

from eodal_spark.session import get_spark  # noqa: F401

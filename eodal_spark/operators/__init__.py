"""Relational re-expressions of the reference's raster/vector operators."""

"""Plan utilities: lineage/metrics emission and explain helpers."""

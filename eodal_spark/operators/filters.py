"""Metadata Filter grammar — `eodal/mapper/filter.py` parity.

The reference models catalog predicates as ``<entity> <operator>
<value>`` triples with the operator whitelist ["<","<=","==","!=",">",
">="] (`eodal/mapper/filter.py:24-97`), applied via string-eval against
STAC items (`eodal/metadata/stac/client.py:91-139`) or sqlalchemy
(`eodal/metadata/database/querying.py:95-129`).  Here a Filter compiles
to a Catalyst predicate — same grammar, but it participates in
predicate pushdown / partition pruning instead of post-hoc Python eval.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "in": lambda c, v: c.isin(list(v)),  # extension over the reference
}


@dataclass(frozen=True)
class Filter:
    """≡ eodal.mapper.filter.Filter (entity, operator, value) with the
    same operator validation (filter.py:49-77)."""

    entity: str
    operator: str
    value: object

    def __post_init__(self):
        if self.operator not in _OPS:
            raise ValueError(
                f"operator {self.operator!r} not in {sorted(_OPS)}"
            )

    def expression(self) -> Column:
        return _OPS[self.operator](F.col(self.entity), self.value)


def apply_filters(df: DataFrame, filters: list[Filter]) -> DataFrame:
    """AND-combine, exactly like the reference's sequential filter
    application (stac/client.py:124-136). Catalyst pushes each
    conjunct to the scan."""
    for f in filters:
        df = df.filter(f.expression())
    return df

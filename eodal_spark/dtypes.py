"""Dtype promotion lattice for heterogeneous multi-band stacking.

≡ `/root/reference/eodal/core/utils/__init__.py:7-39`
(`get_highest_dtype` over numpy ranks, used by the reference when
stacking bands of different dtypes into one multi-band write).  The
Spark analogue ranks Spark SQL numeric types and casts every relation
of a stack to the common highest type before the union/write, so a
uint8 QA band and a float32 reflectance band stack losslessly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# promotion lattice: any type can be cast LOSSLESSLY to any later type
# for the value ranges the earlier type can hold (int→long exact;
# long→double is the one classic lossy edge — ranked so an explicit
# decimal beats double when both appear, matching numpy's int64→float64
# promotion semantics the reference inherits)
_RANK: dict[type, int] = {
    T.BooleanType: 0,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 3,
    T.LongType: 4,
    T.FloatType: 5,
    T.DoubleType: 6,
    T.DecimalType: 7,
}


def type_rank(dt: T.DataType) -> int:
    """Rank of a numeric Spark type in the promotion lattice
    (≡ get_rank, reference utils/__init__.py:18-28)."""
    try:
        return _RANK[type(dt)]
    except KeyError:
        raise ValueError(f"unknown/non-numeric data type: {dt}") from None


# decimal digits needed to hold the full range of each integral type —
# a LongType member of a decimal stack forces 19 integer digits, else
# cast('decimal(p,s)') NULLs large values (silent loss, ANSI off)
_INT_DIGITS: dict[type, int] = {
    T.BooleanType: 1,
    T.ByteType: 3,
    T.ShortType: 5,
    T.IntegerType: 10,
    T.LongType: 19,
}


def highest_type(dtypes: list[T.DataType]) -> T.DataType:
    """Highest common type of a list (≡ get_highest_dtype,
    reference utils/__init__.py:31-39) — sized so every member's full
    value range survives the cast:

    * decimal stack: scale = max member scale; integer digits = max
      over decimal int-parts AND integral members' range digits;
    * decimal + float/double: DoubleType (the approximate member makes
      decimal exactness unpreservable; double at least keeps range);
    * float32 + int32/int64: DoubleType (float32's 24-bit mantissa
      corrupts ints > 2^24 — numpy's int32+float32→float64 rule, which
      the reference inherits);
    * long + double stays double — the one classic lossy edge, same as
      numpy int64→float64.
    """
    if not dtypes:
        raise ValueError("empty dtype list")
    best = max(dtypes, key=type_rank)
    if isinstance(best, T.DecimalType):
        if any(isinstance(d, (T.FloatType, T.DoubleType)) for d in dtypes):
            return T.DoubleType()
        decs = [d for d in dtypes if isinstance(d, T.DecimalType)]
        ints = [d for d in dtypes if not isinstance(d, T.DecimalType)]
        scale = max(d.scale for d in decs)
        intpart = max(
            [d.precision - d.scale for d in decs]
            + [_INT_DIGITS[type(d)] for d in ints]
        )
        return T.DecimalType(min(intpart + scale, 38), scale)
    if isinstance(best, T.FloatType) and any(
        type_rank(d) >= _RANK[T.IntegerType]
        for d in dtypes
        if not isinstance(d, T.FloatType)
    ):
        return T.DoubleType()
    return best


def stack_promote(
    dfs: list[DataFrame], value_cols: tuple[str, ...]
) -> list[DataFrame]:
    """Cast ``value_cols`` of every DataFrame to the stack's common
    highest type (per column), so the subsequent ``unionByName``/write
    does not silently truncate — the multi-band-write promotion rule.
    Non-value columns must already agree."""
    out = []
    common = {
        c: highest_type([df.schema[c].dataType for df in dfs]) for c in value_cols
    }
    for df in dfs:
        for c, dt in common.items():
            if df.schema[c].dataType != dt:
                df = df.withColumn(c, F.col(c).cast(dt))
        out.append(df)
    return out


def stack_union(dfs: list[DataFrame], value_cols: tuple[str, ...]) -> DataFrame:
    """Promote then union — the one-call band-stack merge."""
    promoted = stack_promote(dfs, value_cols)
    uni = promoted[0]
    for df in promoted[1:]:
        uni = uni.unionByName(df)
    return uni

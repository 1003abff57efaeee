"""Per-column aggregation policy and registry (reference primitive P6).

The reference's default aggregation is null-skipping `mean` for Continuous
columns and null-skipping `first` otherwise, returning missing for all-missing
groups (`_defaultagg`/`_skipmissing`, reference: src/utils.jl:12-21).  Users
override per column with `var => fn` pairs (reference: src/uniquecoords.jl:24,
src/aggregate.jl:26).

Spark mapping
-------------
* ``mean``  → ``avg`` (null-skipping, returns NULL on empty — exact match)
* ``first``/``last`` → deterministic first/last **by an order column**, built
  as ``min/max(struct(order, value))`` over non-null values.  Spark's own
  ``first(ignorenulls=True)`` is shuffle-order dependent; the reference's
  `first` is index order, so we thread the frozen ``row_id`` through.
* ``median`` → exact ``median`` (Spark's is the exact type-7 percentile, same
  interpolation as Julia's `quantile`; see P8 in SURVEY.md §2.2)
* ``std`` → ``stddev_samp`` (Julia `std` is the n-1 corrected estimator)
* ``mode`` → deterministic mode with smallest-value tie-break (P7): a grouped
  pandas UDAF so it composes with built-in aggs in a single hash aggregate.

All of these are expressions inside one Catalyst hash-aggregate — partial
(map-side) aggregation and AQE partition coalescing come for free.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Column scitype policy: Spark storage type → 'continuous' | 'categorical'.
# Floats are Continuous; integers/strings/booleans default to `first` — the
# reference's own tests aggregate a rand(Int) column with `first`
# (test/aggregate.jl:15-16), matching DataScienceTraits where Int is not
# Continuous.  Override per call when an int column is genuinely continuous.
CONTINUOUS_TYPES = (
    T.DoubleType,
    T.FloatType,
    T.DecimalType,
)


def scitype_of(dtype: T.DataType) -> str:
    if isinstance(dtype, CONTINUOUS_TYPES):
        return "continuous"
    return "categorical"


# value types whose min_by/max_by aggregation buffer is mutable — these stay
# in Catalyst's HASH aggregate.  Var-length values (string/binary/array/struct)
# force the sort-based fallback, measured empirically: min_by(int, long) →
# HashAggregate, min_by(string, long) → SortAggregate.
_FIXED_WIDTH = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.DecimalType,
)


def first_by(
    col: Union[str, Column], order: Union[str, Column], dtype: Optional[T.DataType] = None
) -> Column:
    """First non-null value of `col` in `order` order (deterministic).

    Fixed-width dtypes use ``min_by`` with a null-masked ordering key (rows
    where the value is null get a null key, which MaxMinBy skips) — a pure
    HASH aggregate.  Var-length dtypes fall back to min-over-struct, which
    Catalyst plans as a (partial-aggregating) SortAggregate; callers that
    know the column is low-cardinality should dictionary-encode first
    (see operators.uniquecoords).
    """
    c = F.col(col) if isinstance(col, str) else col
    o = F.col(order) if isinstance(order, str) else order
    if dtype is not None and isinstance(dtype, _FIXED_WIDTH):
        return F.min_by(c, F.when(c.isNotNull(), o))
    return F.min(F.when(c.isNotNull(), F.struct(o.alias("o"), c.alias("v")))).getField("v")


def last_by(
    col: Union[str, Column], order: Union[str, Column], dtype: Optional[T.DataType] = None
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    o = F.col(order) if isinstance(order, str) else order
    if dtype is not None and isinstance(dtype, _FIXED_WIDTH):
        return F.max_by(c, F.when(c.isNotNull(), o))
    return F.max(F.when(c.isNotNull(), F.struct(o.alias("o"), c.alias("v")))).getField("v")


def mode_expr(col: str, dtype: T.DataType) -> Column:
    """Deterministic mode: most frequent non-null value, ties broken by the
    smallest value (the reference's `_mode` tie-break is Dict-order dependent,
    reference: src/utils.jl:37-43; we fix a total order for reproducibility).

    Implemented as a grouped-agg pandas UDAF so it participates in the same
    Catalyst aggregate as built-in expressions (Arrow-batched, no extra
    shuffle).
    """

    # Series -> scalar type hints mark this as a grouped-agg UDF (the
    # PandasUDFType enum registration is deprecated, SPARK-28264)
    def _mode(v: pd.Series) -> object:
        v = v.dropna()
        if v.empty:
            return None
        counts = v.value_counts()
        top = counts.max()
        return min(c for c, n in counts.items() if n == top)

    udaf = F.pandas_udf(_mode, dtype)
    return udaf(F.col(col))


def _make_builtin(name: str):
    def build(col: str, dtype: T.DataType, order_col: str) -> Column:
        if name == "mean":
            return F.avg(col)
        if name == "sum":
            return F.sum(col)
        if name == "min":
            return F.min(col)
        if name == "max":
            return F.max(col)
        if name == "median":
            return F.median(col)
        if name == "std":
            return F.stddev_samp(col)
        if name == "count":
            return F.count(col)
        if name == "first":
            return first_by(col, order_col, dtype)
        if name == "last":
            return last_by(col, order_col, dtype)
        if name == "mode":
            return mode_expr(col, dtype)
        raise KeyError(name)

    return build


AGG_REGISTRY: Dict[str, Callable[[str, T.DataType, str], Column]] = {
    n: _make_builtin(n)
    for n in ("mean", "sum", "min", "max", "median", "std", "count", "first", "last", "mode")
}
# Julia-style aliases used in the reference tests (test/uniquecoords.jl:53-94)
AGG_REGISTRY["maximum"] = AGG_REGISTRY["max"]
AGG_REGISTRY["minimum"] = AGG_REGISTRY["min"]


def default_agg(dtype: T.DataType) -> str:
    """mean for continuous, first otherwise (reference: src/utils.jl:12-14)."""
    return "mean" if scitype_of(dtype) == "continuous" else "first"


AggLike = Union[str, Callable[[pd.Series], object]]

# names whose registry expression is a grouped-agg pandas UDAF (cannot share a
# single Catalyst aggregate with built-in functions: INVALID_PANDAS_UDF_PLACEMENT)
_PANDAS_AGGS = {"mode"}


def grouped_agg(
    df: DataFrame,
    keys: Sequence[str],
    exprs: Mapping[str, Column],
    pandas_cols: Sequence[str] = (),
) -> DataFrame:
    """groupBy(keys).agg(exprs) that transparently splits pandas UDAF columns
    into a second aggregate joined back on the keys (Spark disallows mixing
    grouped-agg pandas UDFs with built-in aggregate functions)."""
    pset = set(pandas_cols)
    builtin = [exprs[c] for c in exprs if c not in pset]
    pandas_ = [exprs[c] for c in exprs if c in pset]
    if not pandas_ or not builtin:
        return df.groupBy(*keys).agg(*(builtin or pandas_))
    a = df.groupBy(*keys).agg(*builtin)
    b = df.groupBy(*keys).agg(*pandas_)
    return a.join(b, list(keys))


MAX_DICT = 1 << 16


def dict_encode_strings(
    df: DataFrame,
    value_cols: Sequence[str],
    overrides: Optional[Mapping[str, AggLike]] = None,
):
    """Dictionary-encode low-cardinality STRING value columns that aggregate
    with first/last, so the grouped aggregate stays a Catalyst HASH aggregate.

    A string min_by/first buffer is immutable and forces the sort-based
    aggregate fallback — a per-partition sort of every input row, which
    dominates the tile/block ops at scale.  Re-coding such columns to int
    codes keeps the whole aggregation hash-based; the caller decodes the
    grouped output with the returned ``decode`` map (col → array literal of
    the dictionary, 1-indexed via ``element_at(arr, code + 1)``).

    Cost: two tiny driver-bound scans total regardless of string-column count
    (one approx_count_distinct screen, one collect_set for the survivors) —
    never a per-column distinct.  Columns whose dictionary would exceed
    ``MAX_DICT`` stay strings on the sort path.

    Returns ``(df, decode)``; ``decode`` is empty when nothing was encoded.
    """
    decode: Dict[str, Column] = {}
    ov = dict(overrides or {})
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    cands = []
    for c in value_cols:
        spec = ov.get(c, default_agg(dtypes[c]))
        if isinstance(dtypes[c], T.StringType) and spec in ("first", "last"):
            cands.append(c)
    if cands:
        acd = df.agg(*[F.approx_count_distinct(c).alias(c) for c in cands]).first()
        # ~2% HLL error; keep headroom, verify exactly after the collect_set
        cands = [c for c in cands if acd[c] <= int(MAX_DICT * 0.95)]
    if cands:
        sets = df.agg(*[F.sort_array(F.collect_set(c)).alias(c) for c in cands]).first()
        for c in cands:
            vals = list(sets[c])
            if len(vals) > MAX_DICT:
                continue
            code = F.map_from_arrays(
                F.array(*[F.lit(v) for v in vals]),
                F.array(*[F.lit(i) for i in range(len(vals))]),
            )
            # the dictionary is a snapshot from a separate action; if the
            # input lineage is non-deterministic (seedless sample, rand),
            # the aggregation job can re-evaluate to values absent from the
            # snapshot — element_at(map, missing) is NULL even under ANSI
            # (measured on 4.1), which would silently corrupt first/last to
            # NULL.  Fail loudly instead of corrupting.
            enc = F.when(F.col(c).isNull(), F.lit(None).cast("int")).otherwise(
                F.coalesce(
                    F.element_at(code, F.col(c)),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"dict_encode_strings: value of column '{c}' not "
                                "in the dictionary snapshot — non-deterministic "
                                "input lineage? value="
                            ),
                            F.col(c),
                        )
                    ).cast("int"),
                )
            )
            df = df.withColumn(c, enc)
            decode[c] = F.array(*[F.lit(v) for v in vals])
    return df, decode


def dict_decode(out: DataFrame, decode: Mapping[str, Column]) -> DataFrame:
    """Invert :func:`dict_encode_strings` on the aggregated output.

    NULL codes (all-NULL groups) need an explicit guard: on this Spark build
    (4.x, ANSI on) ``element_at(arr, NULL)`` is NOT null-safe — it returns the
    LAST array element (and aborts with INVALID_ARRAY_INDEX_IN_ELEMENT_AT when
    the dictionary is empty, i.e. an all-NULL input column), measured
    empirically.  The ``when`` guard decodes NULL → NULL like the sort path.
    """
    for c, arr in decode.items():
        idx = F.col(c) + 1
        out = out.withColumn(c, F.when(idx.isNotNull(), F.element_at(arr, idx)))
    return out


def resolve_aggs(
    df: DataFrame,
    value_cols: Sequence[str],
    overrides: Optional[Mapping[str, AggLike]] = None,
    order_col: str = "row_id",
):
    """Build the aggregation expression map for `value_cols` of `df`.

    `overrides` maps column → registry name or a Python callable
    (pd.Series → scalar); callables become grouped-agg pandas UDAFs with the
    column's own dtype as the return type (the reference accepts arbitrary
    Julia functions the same way, src/uniquecoords.jl:42-49).

    Returns ``(exprs, pandas_cols)`` — pass both to :func:`grouped_agg`.
    """
    overrides = dict(overrides or {})
    unknown = set(overrides) - set(value_cols)
    if unknown:
        raise ValueError(f"override for non-value columns: {sorted(unknown)}")
    dtypes = dict((f.name, f.dataType) for f in df.schema.fields)
    out: Dict[str, Column] = {}
    pandas_cols: list = []
    for c in value_cols:
        spec = overrides.get(c, default_agg(dtypes[c]))
        if callable(spec) and not isinstance(spec, str):
            ret = dtypes[c]

            def _wrap(fn=spec, ret=ret):
                def _udaf(v: pd.Series) -> object:
                    v = v.dropna()
                    if v.empty:
                        return None
                    return fn(v)

                return F.pandas_udf(_udaf, ret)

            out[c] = _wrap()(F.col(c)).alias(c)
            pandas_cols.append(c)
        else:
            out[c] = AGG_REGISTRY[spec](c, dtypes[c], order_col).alias(c)
            if spec in _PANDAS_AGGS:
                pandas_cols.append(c)
    return out, pandas_cols

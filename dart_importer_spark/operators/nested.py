"""ES nested-document semantics over array<struct> columns.

ES distinguishes ``object`` fields (arrays are flattened at index time, so
a bool of two conditions may match across DIFFERENT array elements) from
``nested`` fields (each element is indexed as a hidden sub-document, so
conditions must co-match on the SAME element — the classic ES pitfall the
nested type exists to fix). Spark-first, the distinction maps exactly onto
higher-order functions over an array<struct> column:

- nested  -> ``F.exists(arr, x -> cond1(x) AND cond2(x))``  (same element)
- object  -> ``F.exists(arr, cond1) AND F.exists(arr, cond2)``  (any)

Both are pure Catalyst — a narrow filter over the parent table, no
shuffle, no Python. At 100 TB the nested column rides the parent row's
parquet row group, so nested predicates cost one scan of the parent table
and never a child-table join — which is the point of the ES nested type
(Lucene stores nested docs in the same block as the parent for the same
reason).

Reference parity: the reference's ES mappings declare no nested fields,
but the transcripts input (conv_id, turn_idx, role, text, ...) is exactly
the parent/child shape :func:`nest` folds — one conversation row carrying
its turns as a nested column (SURVEY §1.3). The engine side (DSL
``nested`` query clause, ``nested`` aggregation with ``reverse_nested``)
lives in query/dsl.py and query/engine.py over array<struct> doc_stats
meta columns.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nest(
    df: DataFrame,
    keys: Sequence[str],
    elem_cols: Sequence[str],
    order_by: Sequence[str],
    out_col: str = "children",
) -> DataFrame:
    """Fold child rows into one parent row per ``keys`` carrying an
    array<struct> column of the children — the ES nested-document shape.

    ``order_by`` columns lead the struct so ``sort_array`` gives a
    DETERMINISTIC total order regardless of shuffle/partition layout
    (``collect_list`` alone is order-nondeterministic); pass columns that
    uniquely order a parent's children (e.g. ``(ts, event_id)``). One
    shuffle on the parent key; array state is bounded by the largest
    parent's child count.
    """
    order_by = [c for c in order_by]
    extra = [c for c in elem_cols if c not in order_by]
    folded = df.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(*(order_by + extra)))
        ).alias(out_col)
    )
    keep = [c for c in (list(order_by) + extra) if c in elem_cols]
    # project each element down to the declared elem_cols (order columns
    # that are not elem_cols were only needed for the deterministic sort)
    return folded.withColumn(
        out_col,
        F.transform(
            F.col(out_col),
            lambda x: F.struct(*[x[c].alias(c) for c in keep]),
        ),
    )


def same_element(
    arr: Column | str, *preds: Callable[[Column], Column]
) -> Column:
    """ES ``nested`` query semantics: some ONE array element satisfies ALL
    predicates. Pure Catalyst (``exists`` over the array column)."""
    if not preds:
        raise ValueError("same_element: need at least one predicate")
    a = F.col(arr) if isinstance(arr, str) else arr

    def _all(x: Column) -> Column:
        out = preds[0](x)
        for p in preds[1:]:
            out = out & p(x)
        return out

    return F.exists(a, _all)


def any_element(
    arr: Column | str, *preds: Callable[[Column], Column]
) -> Column:
    """ES ``object``-type (flattened) semantics: every predicate is
    satisfied by SOME element, not necessarily the same one — the
    cross-element false positive the nested type exists to prevent.
    Provided for contrast/testing and for mappings that genuinely want
    flattened behavior."""
    if not preds:
        raise ValueError("any_element: need at least one predicate")
    a = F.col(arr) if isinstance(arr, str) else arr
    out = F.exists(a, preds[0])
    for p in preds[1:]:
        out = out & F.exists(a, p)
    return out


def inner_hits(
    df: DataFrame,
    path: str,
    *preds: Callable[[Column], Column],
    size: int = 3,
    out_col: str | None = None,
) -> DataFrame:
    """ES nested ``inner_hits``: the parents some element of whose
    ``path`` array satisfies ALL predicates (the :func:`same_element`
    match set), each carrying the MATCHING elements themselves — the
    first ``size`` in array order (ES's inner_hits ``size``, default 3;
    the arrays :func:`nest` builds are deterministically sorted, so
    "first" is stable). This is the debugging view ES users reach for
    the moment a nested query matches: WHICH element matched, not just
    that one did.

    Pure Catalyst — ``filter`` + ``slice`` over the array column, a
    narrow projection with no explode, join, or shuffle; at 100 TB the
    matching elements come out of the same parent-row parquet row-group
    read that evaluated the predicate (the Lucene block-join locality
    argument, unchanged)."""
    if not preds:
        raise ValueError("inner_hits: need at least one predicate")
    out_col = out_col or f"{path}_inner_hits"

    def _all(x: Column) -> Column:
        out = preds[0](x)
        for p in preds[1:]:
            out = out & p(x)
        return out

    return df.filter(F.exists(F.col(path), _all)).withColumn(
        out_col, F.slice(F.filter(F.col(path), _all), 1, size)
    )


def explode_nested(
    df: DataFrame, path: str, parent_cols: Sequence[str] = ()
) -> DataFrame:
    """Explode a nested column into child rows (``<path>.<field>``
    columns), keeping the named parent columns — the ES ``nested``
    aggregation's element stream. Narrow (explode is a generator, no
    shuffle)."""
    ex = df.select(*parent_cols, F.explode(F.col(path)).alias("_elem"))
    elem_fields = [f.name for f in ex.schema["_elem"].dataType.fields]
    return ex.select(
        *parent_cols,
        *[F.col(f"_elem.{f}").alias(f"{path}.{f}") for f in elem_fields],
    )

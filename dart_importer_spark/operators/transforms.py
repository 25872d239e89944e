"""ES transforms: entity-centric materializations of an event stream.

ES ``_transform`` jobs continuously fold a document stream into an
entity-centric destination index, in two flavors this module implements
as DataFrame plans (the reference's ES deployment exposes both):

- **latest** — one row per entity: the most recent document by a sort
  column (:func:`transform_latest`).
- **pivot** — one row per group: aggregations over the group's documents
  (:func:`transform_pivot`), plus the incremental-refresh step ES runs on
  a checkpoint interval (:func:`transform_pivot_incremental`): only
  entities touched by the new batch are recomputed from source and
  spliced into the previous materialization — the unchanged 99.99% of a
  100-TB destination is never read, rewritten, or shuffled.

Scale shape: ``transform_latest`` is a single ``max_by`` hash aggregate
— partial aggregation runs map-side, so the shuffle carries one row per
(entity x input-partition), not one per event; no window sort of the
whole stream. ``transform_pivot_incremental`` computes the touched-key
set from the (small) new batch, broadcast-semi-joins the source down to
those entities, recomputes exactly those groups, and anti-joins them out
of the previous snapshot — cost is O(new batch + touched entities), not
O(destination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _keys(by: str | list[str]) -> list[str]:
    return [by] if isinstance(by, str) else list(by)


def transform_latest(
    df: DataFrame,
    by: str | list[str],
    sort_on: str,
    tiebreak: str,
    cols: list[str],
) -> DataFrame:
    """ES latest transform: for each ``by`` entity, the ``cols`` of the
    single most recent row by (``sort_on``, ``tiebreak``) — the tiebreak
    must be unique within a key (ES uses _doc order; a unique id keeps
    the result engine-reproducible).
    """
    keys = _keys(by)
    pick = F.max_by(
        F.struct(*[F.col(c) for c in cols]),
        F.struct(F.col(sort_on), F.col(tiebreak)),
    ).alias("_latest")
    out = df.groupBy(*keys).agg(pick)
    return out.select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in cols])


def transform_pivot(
    df: DataFrame,
    by: str | list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """ES pivot transform: one row per ``by`` group with the requested
    aggregations. ``aggs`` maps output column -> (agg, source column),
    agg in {count, sum, min, max, avg}. All five are semigroup/partial-
    aggregable, so the shuffle carries pre-combined partials.
    """
    keys = _keys(by)
    fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max,
           "avg": F.avg}
    exprs = []
    for out_col, (agg, src) in aggs.items():
        if agg not in fns:
            raise ValueError(f"transform_pivot: unsupported agg {agg!r}")
        exprs.append(fns[agg](F.col(src)).alias(out_col))
    return df.groupBy(*keys).agg(*exprs)


def transform_pivot_incremental(
    prev: DataFrame,
    source: DataFrame,
    new_batch: DataFrame,
    by: str | list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """One ES transform checkpoint step: given the previous pivot
    materialization ``prev``, the full ``source`` (old rows + the new
    batch already landed), and the ``new_batch`` itself, recompute ONLY
    the entities the batch touched and splice them into ``prev``.

    Exactly equivalent to ``transform_pivot(source, by, aggs)`` (tested),
    at O(batch + touched-entity rows) cost: the touched-key set comes
    from the batch (small -> broadcast), the source is semi-joined down
    to touched entities before any aggregation, and the carried-over rows
    leave ``prev`` untouched via an anti-join on the same broadcast set.
    """
    keys = _keys(by)
    touched = new_batch.select(*keys).distinct()
    recomputed = transform_pivot(
        source.join(F.broadcast(touched), on=keys, how="left_semi"),
        keys,
        aggs,
    )
    carried = prev.join(F.broadcast(touched), on=keys, how="left_anti")
    return carried.unionByName(recomputed)

"""EQL-style sequence detection over event / transcript tables.

ES ships EQL (Event Query Language) for exactly the table shape this
engine indexes — keyed, timestamped event streams (the reference's
transcripts are (conv_id, turn_idx, role, tool, ts) event logs; the
events fixture is (user_id, event_type, ts)). The core EQL construct is

    sequence by <key> with maxspan=<T> [ step1 ] [ step2 ] ... [ stepK ]

— ordered multi-step pattern matching per key. This module implements
that core as a pure DataFrame plan.

Matching contract (the deterministic single-slot reading of ES EQL's
state machine): a step-k event completes the MOST RECENT open step-(k-1)
partial sequence on the same key that precedes it in (ts, id) order; a
completed sequence is emitted when the last step's timestamp is within
``maxspan_s`` of the first step's. An event never pairs with itself
(strictly-preceding window frame), and ties are broken by the unique
event id, so results are exactly reproducible by any engine.

Scale shape: ONE shuffle on the sequence key and ONE sort per partition
— every per-step pass is a window over the SAME (key, ts, id) spec, so
Spark chains the Window nodes without re-partitioning or re-sorting
(each node's required ordering is already satisfied by the first sort).
No self-joins: a K-step sequence over N events costs O(N log N) per
key-partition regardless of K or match density, unlike the join-based
funnel formulation whose intermediate blows up on hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def eql_sequence(
    df: DataFrame,
    by: str | list[str],
    steps: list[str | Column],
    on: str = "ts",
    event_id: str = "event_id",
    maxspan_s: float | None = None,
    until: str | Column | None = None,
    pipe: tuple[str, int] | None = None,
) -> DataFrame:
    """ES EQL ``sequence by <by> with maxspan [steps...] until [...]``.

    ``steps`` are boolean predicates (SQL strings or Columns), one per
    sequence step, length >= 2. ``on`` is the event-time column
    (timestamp or numeric), ``event_id`` a unique orderable id column
    used for deterministic tie-breaks and for naming the matched events.

    ``until`` (EQL's expiration clause) kills open partial sequences: a
    partial whose last matched step is strictly OLDER than a subsequent
    until-event's timestamp is dead when the next step tries to consume
    it (a time tie does not kill — the deterministic reading of "until
    ends sequences that haven't completed"). Until events are evaluated
    independently of the step predicates and are never part of a match.

    Returns one row per completed sequence: the key column(s), ``e1`` ..
    ``eK`` (the matched events' ids, in step order) and ``span_s`` (the
    floor of last-minus-first event time in seconds, bigint). Only the
    maxspan filter uses event time, so the output is integer-typed and
    engine-portable.

    ``pipe`` implements EQL's result pipes — the two ES supports:
    ``("head", n)`` keeps the n EARLIEST completed sequences,
    ``("tail", n)`` the n LATEST, both by (completion time, completing
    event id) so selection is deterministic; output rows are the same
    columns either way. A pipe is a TakeOrderedAndProject over the
    already-matched sequences — no extra shuffle.
    """
    if len(steps) < 2:
        raise ValueError(f"eql_sequence: need >= 2 steps, got {len(steps)}")
    keys = [by] if isinstance(by, str) else list(by)
    preds = [F.expr(s) if isinstance(s, str) else s for s in steps]
    k = len(preds)
    until_pred = (
        F.expr(until) if isinstance(until, str) else until
    )

    # cast via timestamp keeps microsecond precision as fractional epoch
    # seconds (TIMESTAMP_NTZ can't cast straight to double; the constant
    # session-tz offset cancels in every span difference)
    dtype = dict(df.dtypes).get(on, "")
    t = (
        F.col(on).cast("timestamp").cast("double")
        if "timestamp" in dtype or "date" in dtype
        else F.col(on).cast("double")
    )
    eid = F.col(event_id)
    w = Window.partitionBy(*keys).orderBy(on, event_id)
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)

    out = df.withColumn(
        "_s1",
        F.when(preds[0], F.struct(t.alias("t1"), eid.alias("e1"))),
    )
    if until_pred is not None:
        # most recent until-event time strictly before this row — one more
        # column over the SAME window spec, still one shuffle + one sort
        out = out.withColumn(
            "_u", F.last(F.when(until_pred, t), ignorenulls=True).over(wprev)
        )

    def _alive(i: int) -> Column:
        """Partial _p{i} is consumable: exists, and no until-event fired
        strictly after its last matched step."""
        exists = F.col(f"_p{i}").isNotNull()
        if until_pred is None:
            return exists
        u = F.col("_u")
        return exists & (u.isNull() | (u <= F.col(f"_p{i}.t{i}")))

    for i in range(2, k + 1):
        prev = F.last(f"_s{i - 1}", ignorenulls=True).over(wprev)
        out = out.withColumn(f"_p{i - 1}", prev)
        carry = [
            F.col(f"_p{i - 1}.{fld}").alias(fld)
            for j in range(1, i)
            for fld in (f"t{j}", f"e{j}")
        ]
        if i < k:
            out = out.withColumn(
                f"_s{i}",
                F.when(
                    preds[i - 1] & _alive(i - 1),
                    F.struct(*carry, t.alias(f"t{i}"), eid.alias(f"e{i}")),
                ),
            )

    last_p = F.col(f"_p{k - 1}")
    done = out.filter(preds[k - 1] & _alive(k - 1))
    if maxspan_s is not None:
        done = done.filter(t - last_p["t1"] <= F.lit(float(maxspan_s)))
    sel = (
        [F.col(c) for c in keys]
        + [last_p[f"e{j}"].alias(f"e{j}") for j in range(1, k)]
        + [
            eid.alias(f"e{k}"),
            F.floor(t - last_p["t1"]).cast("long").alias("span_s"),
        ]
    )
    if pipe is not None:
        op, n = pipe
        if op not in ("head", "tail") or int(n) < 1:
            raise ValueError(
                f"eql_sequence: pipe must be ('head'|'tail', n>=1), got {pipe!r}"
            )
        order = (
            [t.asc(), eid.asc()] if op == "head" else [t.desc(), eid.desc()]
        )
        return done.orderBy(*order).limit(int(n)).select(*sel)
    return done.select(*sel)


def eql_sample(
    df: DataFrame,
    by: str | list[str],
    filters: list[str | Column],
    on: str = "ts",
    event_id: str = "event_id",
) -> DataFrame:
    """ES EQL ``sample by <by> [filter1] [filter2] ...`` — the UNORDERED
    sibling of ``sequence``: for every key where each filter matches at
    least one event (in any order, no time window), return one sample
    event per filter. Deterministic sampling contract: the EARLIEST
    matching event per filter by (``on``, ``event_id``).

    Returns the key column(s) plus ``e1`` .. ``eK`` (the sampled events'
    ids, one per filter).

    Scale shape: one hash aggregate — each filter becomes a
    null-skipping ``min(when(pred, struct(t, id)))``, so partial
    aggregation combines map-side and the shuffle carries K small
    structs per (key x input-partition). No windows, no sort, no join.
    """
    if not filters:
        raise ValueError("eql_sample: need >= 1 filters")
    keys = [by] if isinstance(by, str) else list(by)
    preds = [F.expr(s) if isinstance(s, str) else s for s in filters]
    dtype = dict(df.dtypes).get(on, "")
    t = (
        F.col(on).cast("timestamp").cast("double")
        if "timestamp" in dtype or "date" in dtype
        else F.col(on).cast("double")
    )
    eid = F.col(event_id)
    aggs = [
        F.min(F.when(p, F.struct(t.alias("t"), eid.alias("e")))).alias(
            f"_m{i}"
        )
        for i, p in enumerate(preds, start=1)
    ]
    out = df.groupBy(*keys).agg(*aggs)
    cond = None
    for i in range(1, len(preds) + 1):
        c = F.col(f"_m{i}").isNotNull()
        cond = c if cond is None else (cond & c)
    return out.filter(cond).select(
        *keys,
        *[
            F.col(f"_m{i}.e").alias(f"e{i}")
            for i in range(1, len(preds) + 1)
        ],
    )

"""EQL sequence detection: pandas-recompute identity + contract edges +
plan shape (one shuffle, chained same-spec windows, no self-join)."""

from __future__ import annotations

import pandas as pd
import pytest

from dart_importer_spark.operators.eql import eql_sequence


@pytest.fixture(scope="module")
def events_df(spark):
    # deterministic keyed event log: 3 keys x interleaved types, integer
    # event-time column (eql_sequence accepts numeric `on` directly)
    rows = []
    eid = 0
    for key in range(3):
        for i in range(40):
            rows.append((key, eid, ["a", "b", "c", "x"][(i + key) % 4],
                         100 * i + key))
            eid += 1
    return spark.createDataFrame(
        rows, "k int, event_id long, etype string, t long"
    )


def _pandas_oracle(pdf: pd.DataFrame, steps, maxspan):
    """Single-slot state machine per key, literally."""
    out = []
    for k, g in pdf.sort_values(["t", "event_id"]).groupby("k"):
        partial = [None] * len(steps)  # partial[i] = tuple of ids+t1
        for r in g.itertuples(index=False):
            # evaluate completions BEFORE opening a new partial with the
            # same event (strictly-preceding frame: no self-pairing)
            nxt = list(partial)
            for i, pred in enumerate(steps):
                if not pred(r):
                    continue
                if i == 0:
                    nxt[0] = (r.t, [r.event_id])
                elif partial[i - 1] is not None:
                    t1, ids = partial[i - 1]
                    if i == len(steps) - 1:
                        if r.t - t1 <= maxspan:
                            out.append((k, *ids, r.event_id, (r.t - t1)))
                    else:
                        nxt[i] = (t1, ids + [r.event_id])
            partial = nxt
    return sorted(out)


def test_matches_pandas_state_machine(spark, events_df):
    res = eql_sequence(
        events_df, "k",
        ["etype = 'a'", "etype = 'b'", "etype = 'c'"],
        on="t", maxspan_s=500,
    )
    got = sorted(tuple(r) for r in res.collect())
    want = _pandas_oracle(
        events_df.toPandas(),
        [lambda r: r.etype == "a", lambda r: r.etype == "b",
         lambda r: r.etype == "c"],
        500,
    )
    assert got == want
    assert len(got) > 0


def test_two_step_and_maxspan_boundary(spark):
    df = spark.createDataFrame(
        [(1, 1, "a", 0), (1, 2, "b", 100), (1, 3, "b", 101)],
        "k int, event_id long, etype string, t long",
    )
    r = eql_sequence(df, "k", ["etype = 'a'", "etype = 'b'"],
                     on="t", maxspan_s=100)
    rows = sorted(tuple(x) for x in r.collect())
    # t=100 is INSIDE maxspan (<=); t=101 is outside
    assert rows == [(1, 1, 2, 100)]


def test_no_self_pairing(spark):
    # one event matching both steps must not complete with itself
    df = spark.createDataFrame(
        [(1, 1, "ab", 0)], "k int, event_id long, etype string, t long"
    )
    r = eql_sequence(df, "k", ["etype like '%a%'", "etype like '%b%'"],
                     on="t", maxspan_s=10)
    assert r.count() == 0


def test_latest_partial_wins(spark):
    # two opens before one close: the MOST RECENT open is consumed
    df = spark.createDataFrame(
        [(1, 1, "a", 0), (1, 2, "a", 5), (1, 3, "b", 9)],
        "k int, event_id long, etype string, t long",
    )
    r = eql_sequence(df, "k", ["etype = 'a'", "etype = 'b'"],
                     on="t", maxspan_s=100)
    assert [tuple(x) for x in r.collect()] == [(1, 2, 3, 4)]


def test_requires_two_steps(spark, events_df):
    with pytest.raises(ValueError, match="need >= 2 steps"):
        eql_sequence(events_df, "k", ["etype = 'a'"], on="t")


def test_plan_one_shuffle_no_join(spark, events_df):
    r = eql_sequence(
        events_df, "k",
        ["etype = 'a'", "etype = 'b'", "etype = 'c'"],
        on="t", maxspan_s=500,
    )
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # exactly one hash exchange feeds the windows (no per-step re-shuffle)
    assert plan.count("Exchange hashpartitioning") == 1
    # both chained Window nodes share the ONE sort
    assert plan.count("Window") == 2
    assert plan.count("Sort [k#") <= 1 or plan.count("+- *(2) Sort") <= 1

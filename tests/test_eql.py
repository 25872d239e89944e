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


def _pandas_oracle(pdf: pd.DataFrame, steps, maxspan, until=None):
    """Single-slot state machine per key, literally. partial[i] =
    (t1, last_t, ids); a partial is consumable iff no until-event fired
    strictly after its last matched step (time ties survive)."""
    out = []
    for k, g in pdf.sort_values(["t", "event_id"]).groupby("k"):
        partial = [None] * len(steps)
        last_until = None
        for r in g.itertuples(index=False):
            # evaluate completions BEFORE opening a new partial with the
            # same event (strictly-preceding frame: no self-pairing) and
            # BEFORE registering this row as an until-event
            nxt = list(partial)
            for i, pred in enumerate(steps):
                if not pred(r):
                    continue
                if i == 0:
                    nxt[0] = (r.t, r.t, [r.event_id])
                elif partial[i - 1] is not None:
                    t1, last_t, ids = partial[i - 1]
                    if last_until is not None and last_until > last_t:
                        continue  # killed by until
                    if i == len(steps) - 1:
                        if r.t - t1 <= maxspan:
                            out.append((k, *ids, r.event_id, (r.t - t1)))
                    else:
                        nxt[i] = (t1, r.t, ids + [r.event_id])
            partial = nxt
            if until is not None and until(r):
                last_until = r.t
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


def test_until_matches_pandas_state_machine(spark):
    # pattern chosen so the until clause prunes SOME but not all matches
    pat = ["c", "b", "x", "c", "x", "c", "x", "b", "b", "a", "b"]
    rows, eid = [], 0
    for key in range(3):
        for i in range(40):
            rows.append((key, eid, pat[(i + key) % len(pat)], 100 * i + key))
            eid += 1
    df = spark.createDataFrame(
        rows, "k int, event_id long, etype string, t long"
    )
    res = eql_sequence(
        df, "k",
        ["etype = 'a'", "etype = 'b'", "etype = 'c'"],
        on="t", maxspan_s=500, until="etype = 'x'",
    )
    got = sorted(tuple(r) for r in res.collect())
    import pandas as pd  # noqa: F811

    pdf = pd.DataFrame(rows, columns=["k", "event_id", "etype", "t"])
    steps = [lambda r: r.etype == "a", lambda r: r.etype == "b",
             lambda r: r.etype == "c"]
    want = _pandas_oracle(pdf, steps, 500, until=lambda r: r.etype == "x")
    assert got == want
    # the until clause must actually prune something on this corpus
    no_until = len(_pandas_oracle(pdf, steps, 500))
    assert 0 < len(got) < no_until


def test_until_kills_open_partial(spark):
    df = spark.createDataFrame(
        [(1, 1, "a", 0), (1, 2, "kill", 5), (1, 3, "b", 9),
         (1, 4, "a", 20), (1, 5, "b", 30)],
        "k int, event_id long, etype string, t long",
    )
    r = eql_sequence(df, "k", ["etype = 'a'", "etype = 'b'"],
                     on="t", maxspan_s=100, until="etype = 'kill'")
    # first partial (t=0) is killed at t=5; the second (t=20) completes
    assert [tuple(x) for x in r.collect()] == [(1, 4, 5, 10)]


def test_until_time_tie_survives(spark):
    # until at the SAME timestamp as the partial's last step: tie survives
    df = spark.createDataFrame(
        [(1, 1, "a", 0), (1, 2, "kill", 0), (1, 3, "b", 5)],
        "k int, event_id long, etype string, t long",
    )
    r = eql_sequence(df, "k", ["etype = 'a'", "etype = 'b'"],
                     on="t", maxspan_s=100, until="etype = 'kill'")
    assert [tuple(x) for x in r.collect()] == [(1, 1, 3, 5)]


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


def test_sample_matches_pandas(spark, events_df):
    from dart_importer_spark.operators.eql import eql_sample

    got = sorted(
        tuple(r)
        for r in eql_sample(
            events_df, "k", ["etype = 'a'", "etype = 'b'", "etype = 'x'"],
            on="t",
        ).collect()
    )
    pdf = events_df.toPandas().sort_values(["t", "event_id"])
    want = []
    for k, g in pdf.groupby("k"):
        picks = []
        for et in ("a", "b", "x"):
            m = g[g.etype == et]
            picks.append(int(m.event_id.iloc[0]) if len(m) else None)
        if all(p is not None for p in picks):
            want.append((k, *picks))
    assert got == sorted(want)
    assert len(got) > 0


def test_sample_requires_all_filters(spark):
    from dart_importer_spark.operators.eql import eql_sample

    df = spark.createDataFrame(
        [(1, 1, "a", 0), (2, 2, "a", 0), (2, 3, "b", 5)],
        "k int, event_id long, etype string, t long",
    )
    got = eql_sample(df, "k", ["etype = 'a'", "etype = 'b'"], on="t")
    # key 1 has no 'b' event -> excluded
    assert [tuple(r) for r in got.collect()] == [(2, 2, 3)]


def test_sample_plan_single_agg(spark, events_df):
    from dart_importer_spark.operators.eql import eql_sample

    r = eql_sample(events_df, "k", ["etype = 'a'", "etype = 'b'"], on="t")
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_pipe_head_tail(spark, events_df):
    from dart_importer_spark.operators.eql import eql_sequence

    args = dict(
        by="k",
        steps=["etype = 'a'", "etype = 'b'"],
        on="t",
    )
    full = eql_sequence(events_df, **args).toPandas()
    # completion time of a sequence = the t of its completing event (e2)
    ev = events_df.toPandas().set_index("event_id")["t"]
    full["t_done"] = full["e2"].map(ev)
    full = full.sort_values(["t_done", "e2"]).reset_index(drop=True)
    n = max(1, len(full) // 3)
    head = eql_sequence(events_df, **args, pipe=("head", n)).toPandas()
    tail = eql_sequence(events_df, **args, pipe=("tail", n)).toPandas()
    assert sorted(head["e2"]) == sorted(full.head(n)["e2"])
    assert sorted(tail["e2"]) == sorted(full.tail(n)["e2"])
    assert list(head.columns) == [c for c in full.columns if c != "t_done"]


def test_pipe_validation(spark, events_df):
    from dart_importer_spark.operators.eql import eql_sequence
    import pytest as _pt

    with _pt.raises(ValueError, match="pipe must be"):
        eql_sequence(
            events_df, "k", ["etype = 'a'", "etype = 'b'"], on="t",
            pipe=("middle", 5),
        )

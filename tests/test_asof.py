"""As-of (point-in-time) join operator: backward match semantics, inclusive
equality, tolerance, missing-match NULLs, and the no-row-Python contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dart_importer_spark.operators.asof import asof_join


def _mk(spark):
    left = spark.createDataFrame(
        [(1, "u1", 10.0), (2, "u1", 25.0), (3, "u2", 5.0), (4, "u3", 50.0)],
        "event_id long, user_id string, ev_ts double",
    )
    right = spark.createDataFrame(
        [("u1", 10.0, 100), ("u1", 20.0, 200), ("u2", 7.0, 300)],
        "user_id string, snap_ts double, val long",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _mk(spark)
    out = asof_join(left, right, on="user_id", left_ts="ev_ts", right_ts="snap_ts")
    got = {r["event_id"]: (r["snap_ts"], r["val"]) for r in out.collect()}
    assert got[1] == (10.0, 100)  # equal ts matches (inclusive)
    assert got[2] == (20.0, 200)  # latest at-or-before 25
    assert got[3] == (None, None)  # u2's only snapshot is later
    assert got[4] == (None, None)  # u3 has no snapshots at all
    assert out.count() == left.count()  # left join: every left row kept


def test_asof_tolerance(spark):
    left, right = _mk(spark)
    out = asof_join(
        left, right, on="user_id", left_ts="ev_ts", right_ts="snap_ts",
        tolerance=4.0,
    )
    got = {r["event_id"]: r["val"] for r in out.collect()}
    assert got[1] == 100   # age 0 <= 4
    assert got[2] is None  # age 5 > 4 -> voided
    assert got[3] is None


def test_asof_prefix_and_plan(spark):
    left, right = _mk(spark)
    out = asof_join(
        left, right, on="user_id", left_ts="ev_ts", right_ts="snap_ts",
        right_prefix="r_",
    )
    assert {"event_id", "user_id", "ev_ts", "r_snap_ts", "r_val"} == set(out.columns)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # one key shuffle (+AQE artifacts)


def test_asof_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "u1", "a", 10.0), (2, "u1", "b", 10.0)],
        "event_id long, user_id string, kind string, ev_ts double",
    )
    right = spark.createDataFrame(
        [("u1", "a", 5.0, 1), ("u1", "b", 6.0, 2)],
        "user_id string, kind string, snap_ts double, val long",
    )
    out = asof_join(
        left, right, on=["user_id", "kind"], left_ts="ev_ts", right_ts="snap_ts"
    )
    got = {r["event_id"]: r["val"] for r in out.collect()}
    assert got == {1: 1, 2: 2}

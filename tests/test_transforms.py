"""ES transforms (latest / pivot / incremental pivot) and graph explore."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dart_importer_spark.operators.transforms import (
    transform_latest,
    transform_pivot,
    transform_pivot_incremental,
)


@pytest.fixture(scope="module")
def stream_df(spark):
    rows = [
        (u, i * 7 + u, f"t{(i + u) % 3}", 10 * i + u, float(i))
        for u in range(5)
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "uid int, event_id long, etype string, t long, v double"
    )


def test_latest_picks_max_by_sort_then_tiebreak(spark, stream_df):
    got = (
        transform_latest(stream_df, "uid", "t", "event_id",
                         ["event_id", "etype"])
        .orderBy("uid")
        .toPandas()
    )
    pdf = stream_df.toPandas()
    want = (
        pdf.sort_values(["t", "event_id"])
        .groupby("uid")
        .tail(1)
        .sort_values("uid")[["uid", "event_id", "etype"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_latest_tiebreak_is_decisive(spark):
    df = spark.createDataFrame(
        [(1, 10, "x", 5), (1, 11, "y", 5)],
        "uid int, event_id long, etype string, t long",
    )
    got = transform_latest(df, "uid", "t", "event_id",
                           ["event_id", "etype"]).collect()
    assert [tuple(r) for r in got] == [(1, 11, "y")]


def test_latest_plan_is_hash_agg_not_window(spark, stream_df):
    r = transform_latest(stream_df, "uid", "t", "event_id", ["event_id"])
    plan = r._jdf.queryExecution().executedPlan().toString()
    # partial-aggregable max_by: two aggregate phases (partial map-side +
    # final) around one exchange, no full Window sort of the stream.
    # struct-keyed max_by plans as SortAggregate (struct buffers aren't
    # hash-aggregable) — still two-phase, the property that matters.
    assert "Window" not in plan
    assert plan.count("Aggregate") == 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_pivot_matches_groupby(spark, stream_df):
    got = (
        transform_pivot(
            stream_df, "uid",
            {"n": ("count", "event_id"), "v_sum": ("sum", "v"),
             "t_max": ("max", "t")},
        )
        .orderBy("uid")
        .toPandas()
    )
    pdf = stream_df.toPandas()
    want = (
        pdf.groupby("uid")
        .agg(n=("event_id", "count"), v_sum=("v", "sum"), t_max=("t", "max"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pivot_rejects_unknown_agg(spark, stream_df):
    with pytest.raises(ValueError, match="unsupported agg"):
        transform_pivot(stream_df, "uid", {"x": ("median", "v")})


def test_incremental_equals_full_recompute(spark, stream_df):
    aggs = {"n": ("count", "event_id"), "v_sum": ("sum", "v")}
    old = stream_df.filter(F.col("t") < 150)
    batch = stream_df.filter(F.col("t") >= 150)
    prev = transform_pivot(old, "uid", aggs)
    got = (
        transform_pivot_incremental(prev, stream_df, batch, "uid", aggs)
        .orderBy("uid")
        .toPandas()
    )
    want = transform_pivot(stream_df, "uid", aggs).orderBy("uid").toPandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_incremental_untouched_entities_carried_not_recomputed(spark):
    aggs = {"n": ("count", "event_id")}
    source = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3)], "uid int, event_id long"
    )
    batch = source.filter(F.col("uid") == 1)
    # poison prev for uid=2: if the splice recomputed it, n would be 1
    prev = spark.createDataFrame([(1, 99), (2, 777)], "uid int, n long")
    got = {
        r["uid"]: r["n"]
        for r in transform_pivot_incremental(
            prev, source, batch, "uid", aggs
        ).collect()
    }
    assert got == {1: 2, 2: 777}


def test_graph_explore_matches_pandas(built_index, transcripts_pdf):
    from dart_importer_spark.functions.tokenizer import tokenize_text

    # mid-frequency synthetic vocab terms (the transcript corpus has no
    # English content words — w-numbered Zipf vocab, see datagen.py)
    got = built_index.graph_explore("w00001 w00004", size=5, min_doc_count=2)
    gpdf = got.toPandas()

    # pandas recompute: JLH vertices + seed->vertex co-occurrence counts
    texts = transcripts_pdf.sort_values(["conv_id", "turn_idx"])["text"]
    toks = [set(tokenize_text(t)) for t in texts]
    seeds = sorted({"w00001", "w00004"})
    fg = [i for i, s in enumerate(toks) if s & set(seeds)]
    n, fgn = len(toks), len(fg)
    from collections import Counter

    bg = Counter(t for s in toks for t in s)
    fgc = Counter(t for i in fg for t in toks[i])
    verts = []
    for t, c in fgc.items():
        if c < 2 or t in seeds:
            continue
        fgp, bgp = c / fgn, bg[t] / n
        verts.append((round((fgp - bgp) * (fgp / bgp), 6), t))
    verts = sorted(verts, key=lambda x: (-x[0], x[1]))[:5]
    vset = {t for _, t in verts}
    edges = Counter()
    for i in fg:
        for s in seeds:
            if s in toks[i]:
                for t in toks[i] & vset:
                    edges[(s, t)] += 1
    want = sorted(
        (src, dst, cnt, dict((t, sc) for sc, t in verts)[dst])
        for (src, dst), cnt in edges.items()
    )
    got_rows = sorted(
        (r.src, r.dst, r.doc_count, r.score) for r in gpdf.itertuples()
    )
    assert got_rows == want
    assert len(got_rows) > 0


def test_graph_explore_empty_query(built_index):
    out = built_index.graph_explore("", size=5)
    assert out.count() == 0
    assert out.columns == ["src", "dst", "doc_count", "score"]

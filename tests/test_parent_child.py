"""ES parent-child join field (has_child / has_parent / parent_id) over the
conv_id -> turns relation of the transcripts model, checked against pandas
recomputation of the BM25 oracle. Reference parity: the reference's corp
(parent) -> per-quarter account rows (children) nesting, import_dart_data.py
cache layout; in ES terms the join-field queries Running-ELK.md-style users
compose over one index."""

from __future__ import annotations

import numpy as np
import pytest

from tests.oracle import BM25Oracle


@pytest.fixture(scope="module")
def src(transcripts_pdf):
    s = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    s["doc_id"] = np.arange(len(s), dtype=np.int64)
    return s


@pytest.fixture(scope="module")
def oracle(src):
    return BM25Oracle(src)


def _want_parents(oracle, src, query, mode):
    s = oracle.scores(query).merge(src[["doc_id", "conv_id"]], on="doc_id")
    g = s.groupby("conv_id")
    agg = {"max": g["score"].max, "sum": g["score"].sum, "avg": g["score"].mean}[
        mode
    ]()
    out = agg.rename("score").reset_index()
    out["n_children"] = g.size().values
    return out


@pytest.mark.parametrize("mode", ["max", "sum", "avg"])
def test_has_child_score_modes(built_index, src, oracle, mode):
    got = built_index.has_child(
        "the and", join_field="conv_id", score_mode=mode, k=1000
    ).toPandas()
    want = _want_parents(oracle, src, "the and", mode)
    assert len(got) == len(want)
    m = got.merge(want, left_on="parent", right_on="conv_id", suffixes=("", "_w"))
    assert len(m) == len(got)
    assert np.allclose(m["score"], m["score_w"], atol=1e-9)
    assert (m["n_children"] == m["n_children_w"]).all()
    # ranking: score desc, parent asc
    srt = got.sort_values(
        ["score", "parent"], ascending=[False, True]
    ).reset_index(drop=True)
    assert list(got["parent"]) == list(srt["parent"])


def test_has_child_min_max_children(built_index, src, oracle):
    want = _want_parents(oracle, src, "the and", "max")
    lo = int(want["n_children"].median())
    got = built_index.has_child(
        "the and", join_field="conv_id", min_children=lo, k=1000
    ).toPandas()
    assert set(got["parent"]) == set(
        want[want["n_children"] >= lo]["conv_id"]
    )
    got2 = built_index.has_child(
        "the and", join_field="conv_id", max_children=lo - 1, k=1000
    ).toPandas()
    assert set(got2["parent"]) == set(
        want[want["n_children"] <= lo - 1]["conv_id"]
    )
    assert set(got["parent"]) | set(got2["parent"]) == set(want["conv_id"])


def test_has_child_none_mode_and_k(built_index, src, oracle):
    got = built_index.has_child(
        "the and", join_field="conv_id", score_mode="none", k=5
    ).toPandas()
    assert (got["score"] == 0.0).all()
    assert list(got["parent"]) == sorted(got["parent"])  # parent-asc order
    assert len(got) == 5
    with pytest.raises(ValueError):
        built_index.has_child("the", score_mode="median")


def test_has_child_empty_query(built_index):
    got = built_index.has_child(
        "zzzqqqxxx_not_a_term", join_field="conv_id", k=10
    ).toPandas()
    assert len(got) == 0
    assert list(got.columns) == ["parent", "score", "n_children"]


def test_has_parent_and_parent_id(built_index, src):
    from pyspark.sql import functions as F

    sizes = src.groupby("conv_id").size()
    lo = int(sizes.median()) + 1
    big = set(sizes[sizes >= lo].index)
    got = built_index.has_parent(
        F.col("n_children") >= lo, join_field="conv_id", k=10_000
    ).toPandas()
    want = src[src["conv_id"].isin(big)].sort_values("doc_id")
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert set(got["parent"]) == big

    one = sorted(big)[0]
    got1 = built_index.parent_id(one, join_field="conv_id", k=10_000).toPandas()
    want1 = src[src["conv_id"] == one]
    assert list(got1["doc_id"]) == sorted(want1["doc_id"])
    assert (got1["parent"] == one).all()


def test_parent_table_matches_groupby(built_index, src):
    got = built_index.parent_table("conv_id").toPandas().set_index("parent")
    sizes = src.groupby("conv_id").size()
    assert (got["n_children"].sort_index() == sizes.sort_index()).all()
    spans = src.groupby("conv_id")["doc_id"].agg(["min", "max"])
    assert (got["first_doc_id"].sort_index() == spans["min"].sort_index()).all()
    assert (got["last_doc_id"].sort_index() == spans["max"].sort_index()).all()


def test_children_agg(built_index, spark):
    """children agg: buckets over ALL children of parents that have >=1
    matching child — recomputed in pandas over the generated corpus."""
    import pandas as pd

    got = built_index.children_agg(
        "the and", join_field="conv_id", on="role", k=10
    ).toPandas()
    meta = built_index.doc_stats().select(
        "doc_id", "conv_id", "role"
    ).toPandas()
    hits = built_index.topk("the and", k=None, prune=False).toPandas()
    par = set(meta[meta["doc_id"].isin(set(hits["doc_id"]))]["conv_id"])
    kids = meta[meta["conv_id"].isin(par)]
    want = (
        kids.groupby("role").size().reset_index(name="n")
        .sort_values(["n", "role"], ascending=[False, True])
    )
    assert list(got["key"]) == list(want["role"])[:10]
    assert list(got["doc_count"]) == list(want["n"])[:10]
    assert built_index.children_agg(
        "zzznotaterm", join_field="conv_id", on="role"
    ).count() == 0


def test_percentiles_bucket(built_index):
    import numpy as np

    buckets = built_index.date_histogram("the", on="ts", interval="day").toPandas()
    got = built_index.percentiles_bucket(
        "the", on="ts", interval="day", percents=(10.0, 50.0, 99.0)
    ).toPandas()
    want = np.percentile(buckets["doc_count"].to_numpy(), [10, 50, 99])
    assert list(got["percent"]) == [10.0, 50.0, 99.0]
    for g, w in zip(got["value"], want):
        assert abs(g - round(float(w), 6)) < 1e-9
    import pytest as _pt
    with _pt.raises(ValueError):
        built_index.percentiles_bucket("the", on="ts", percents=())
    with _pt.raises(ValueError):
        built_index.percentiles_bucket("the", on="ts", percents=(101.0,))

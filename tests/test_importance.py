"""DSIR-style importance weighting: pandas recompute identity, selection
behavior, and plan hygiene (pure Catalyst, no Python in the hot path)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from dart_importer_spark.operators.importance import (
    importance_weights,
    ngram_feature_counts,
    select_by_importance,
)
from dart_importer_spark.functions.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma alpha"),
        (1, "alpha beta beta"),
        (2, "delta epsilon zeta"),
        (3, "delta delta epsilon"),
        (4, "alpha gamma zeta beta"),
        (5, "eta theta iota"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pandas_features(text: str, n_max: int = 2) -> Counter:
    toks = tokenize_text(text)
    c = Counter(toks)
    for n in range(2, n_max + 1):
        for i in range(len(toks) - n + 1):
            c[" ".join(toks[i : i + n])] += 1
    return c


def test_feature_counts_match_pandas(spark, corpus):
    got = {
        (r["id"], r["f"]): r["c"]
        for r in ngram_feature_counts(corpus).collect()
    }
    want = {}
    for doc_id, text in corpus.collect():
        for f, c in _pandas_features(text).items():
            want[(doc_id, f)] = float(c)
    assert got == want


def test_weights_match_pandas(spark, corpus):
    target = corpus.filter("doc_id in (0, 1)")
    got = {
        r["doc_id"]: r["log_w"]
        for r in importance_weights(corpus, target, round_to=None).collect()
    }
    docs = {d: _pandas_features(t) for d, t in corpus.collect()}
    raw_m = Counter()
    for c in docs.values():
        raw_m.update(c)
    tgt_m = Counter()
    for d in (0, 1):
        tgt_m.update(docs[d])
    vocab = set(raw_m) | set(tgt_m)
    tr, tt, v = sum(raw_m.values()), sum(tgt_m.values()), len(vocab)
    want = {
        d: sum(
            c
            * (
                math.log((tgt_m.get(f, 0) + 1.0) / (tt + v))
                - math.log((raw_m.get(f, 0) + 1.0) / (tr + v))
            )
            for f, c in feats.items()
        )
        for d, feats in docs.items()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_target_like_docs_rank_first(spark, corpus):
    # target = the alpha/beta docs; the other alpha/beta doc (4) must
    # outrank every delta/epsilon doc
    target = corpus.filter("doc_id in (0, 1)")
    top = select_by_importance(corpus, target, k=3)
    ids = [r["doc_id"] for r in top.collect()]
    assert set(ids) >= {0, 1}
    assert 4 in ids


def test_selection_is_k_bounded_and_ordered(spark, corpus):
    target = corpus.filter("doc_id = 5")
    out = select_by_importance(corpus, target, k=2).collect()
    assert len(out) == 2
    assert out[0]["log_w"] >= out[1]["log_w"]
    assert out[0]["doc_id"] == 5  # the target doc itself matches best
    plan = (
        select_by_importance(corpus, target, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_rejects_bad_nmax(spark, corpus):
    with pytest.raises(ValueError, match="n_max >= 1"):
        ngram_feature_counts(corpus, n_max=0)

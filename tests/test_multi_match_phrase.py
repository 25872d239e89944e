"""multi_match type=phrase / type=phrase_prefix and per-field phrase
scoring: dis_max combination over per-field PhraseQuery BM25 legs, with
non-primary-field dl decoded from the posting runs (doc_stats holds only
the primary field's dl). Overlapping field vocabularies here exercise the
cross-leg tie_breaker the gate's disjoint-vocab corpus cannot.

ES semantics mirrored: multi_match phrase/phrase_prefix rewrite to one
match_phrase(_prefix) per field combined best_fields (reference queries
compose phrase blocks per Running-ELK.md:230-247)."""

from __future__ import annotations

import math

import pytest

from dart_importer_spark.functions.tokenizer import tokenize_text
from dart_importer_spark.index.build import B, K1, BuildConfig, build_index
from dart_importer_spark.query.engine import InvertedIndex
from dart_importer_spark.query import dsl

ROWS = [
    # (conv_id, turn_idx, body, title) — doc_id = rank under (conv, turn)
    ("c1", 0, "alpha beta gamma", "alpha beta"),          # 0: phrase in BOTH
    ("c1", 1, "alpha beta alpha beta", "gamma delta"),    # 1: body twice
    ("c2", 0, "beta alpha", "alpha beta alpha"),          # 2: title only
    ("c2", 1, "x y z", "zz"),                             # 3: neither
    ("c3", 0, "alpha x beta", "alpha beta xx yy zz"),     # 4: title only
]


@pytest.fixture(scope="module")
def mm_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, body string, title string"
    )
    out = str(tmp_path_factory.mktemp("mmphrase") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        text_cols=("body", "title"),
        meta_cols=(),
    )
    return InvertedIndex(spark, out)


def _phrase_tf(tokens: list[str], phrase: list[str]) -> int:
    return sum(
        1
        for i in range(len(tokens) - len(phrase) + 1)
        if tokens[i : i + len(phrase)] == phrase
    )


def _phrase_scores_py(field_idx: int, phrase: list[str]) -> dict[int, float]:
    """Pure-python Lucene PhraseQuery BM25 over ROWS for one field."""
    toks = [tokenize_text(r[2 + field_idx]) for r in ROWS]
    n = len(ROWS)
    avgdl = sum(len(t) for t in toks) / n
    idf_sum = 0.0
    for term in phrase:  # duplicated terms each count, as the engine does
        df = sum(1 for t in toks if term in t)
        if df == 0:
            return {}
        idf_sum += math.log(1 + (n - df + 0.5) / (df + 0.5))
    out = {}
    for did, t in enumerate(toks):
        tf = _phrase_tf(t, phrase)
        if tf:
            out[did] = idf_sum * tf / (
                tf + K1 * (1 - B + B * len(t) / avgdl)
            )
    return out


def test_phrase_scored_non_primary_field(mm_index):
    got = {
        r["doc_id"]: r["score"]
        for r in mm_index.match_phrase_scored(
            "alpha beta", k=10, field="title"
        ).collect()
    }
    want = _phrase_scores_py(1, ["alpha", "beta"])
    assert got.keys() == want.keys() == {0, 2, 4}
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_multi_match_phrase_dismax_tie_and_boost(mm_index):
    body = _phrase_scores_py(0, ["alpha", "beta"])
    title = _phrase_scores_py(1, ["alpha", "beta"])
    tie = 0.4
    want = {}
    for d in set(body) | set(title):
        legs = [2.0 * body.get(d, 0.0)] if d in body else []
        legs += [title[d]] if d in title else []
        want[d] = max(legs) + tie * (sum(legs) - max(legs))
    got = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "alpha beta", fields=["body^2", "title"], k=10, tie_breaker=tie
        ).collect()
    }
    assert got.keys() == want.keys() == {0, 1, 2, 4}
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)
    # tie_breaker=0 keeps only the best leg
    got0 = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "alpha beta", fields=["body^2", "title"], k=10
        ).collect()
    }
    for d in got0:
        legs = ([2.0 * body[d]] if d in body else []) + (
            [title[d]] if d in title else []
        )
        assert got0[d] == pytest.approx(max(legs), abs=1e-9)


def test_multi_match_phrase_missing_term_leg_skipped(mm_index):
    # 'gamma delta' is a phrase only in title (doc 1); body df(delta)=0
    # drops the body leg entirely instead of erroring
    got = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "gamma delta", fields=["body", "title"], k=10
        ).collect()
    }
    want = _phrase_scores_py(1, ["gamma", "delta"])
    assert got.keys() == want.keys() == {1}
    assert got[1] == pytest.approx(want[1], abs=1e-9)


def test_multi_match_phrase_prefix(mm_index):
    # "alpha be" -> exact 'alpha' + prefix 'be*' at the next position
    # body hits: 0, 1; title hits: 0, 2, 4
    got = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "alpha be", fields=["body", "title^3"], k=10,
            match_type="phrase_prefix", tie_breaker=0.5,
        ).collect()
    }
    assert got == {
        0: pytest.approx(3.0 + 0.5 * 1.0),  # both legs: max 3 + tie*1
        1: pytest.approx(1.0),
        2: pytest.approx(3.0),
        4: pytest.approx(3.0),
    }


def test_multi_match_phrase_validation(mm_index):
    with pytest.raises(ValueError, match="unknown type"):
        mm_index.multi_match_phrase("a b", ["body"], match_type="nope")
    with pytest.raises(ValueError, match="tie_breaker"):
        mm_index.multi_match_phrase("a b", ["body"], tie_breaker=1.5)
    with pytest.raises(ValueError, match="boost"):
        mm_index.multi_match_phrase("a b", ["body^-1"])
    with pytest.raises(ValueError, match="malformed"):
        mm_index.multi_match_phrase("a b", ["body^x"])
    with pytest.raises(ValueError, match="slop"):
        mm_index.multi_match_phrase(
            "a b", ["body"], match_type="phrase_prefix", slop=1
        )
    with pytest.raises(ValueError, match="slop"):
        mm_index.multi_match_phrase("a b", ["body"], slop=-1)


def test_multi_match_phrase_slop(mm_index):
    # slop=0 exactly equals the default path on every doc; slop>0 admits
    # transposed/gapped matches per leg with the 1/(1+cost) anchor weight
    # (leg-level identity to match_phrase_scored(slop) under dis_max)
    base = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "alpha beta", fields=["body^2", "title"], k=10, tie_breaker=0.4
        ).collect()
    }
    zero = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "alpha beta", fields=["body^2", "title"], k=10, tie_breaker=0.4,
            slop=0,
        ).collect()
    }
    assert zero == {k: pytest.approx(v, abs=1e-9) for k, v in base.items()}
    tie = 0.4
    body = {
        r["doc_id"]: r["score"]
        for r in mm_index.match_phrase_scored(
            "alpha beta", k=100, field="body", slop=2
        ).collect()
    }
    title = {
        r["doc_id"]: r["score"]
        for r in mm_index.match_phrase_scored(
            "alpha beta", k=100, field="title", slop=2
        ).collect()
    }
    want = {}
    for d in set(body) | set(title):
        legs = ([2.0 * body[d]] if d in body else []) + (
            [title[d]] if d in title else []
        )
        want[d] = max(legs) + tie * (sum(legs) - max(legs))
    got = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "alpha beta", fields=["body^2", "title"], k=10, tie_breaker=tie,
            slop=2,
        ).collect()
    }
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)
    # slop=2 admits "beta alpha" (doc 2 body) — a leg slop=0 never had
    assert 2 in body


def test_dsl_multi_match_phrase(mm_index):
    body = {
        "query": {
            "multi_match": {
                "query": "alpha beta",
                "fields": ["body^2", "title"],
                "type": "phrase",
                "tie_breaker": 0.4,
            }
        },
        "size": 10,
    }
    via_dsl = {
        r["doc_id"]: r["score"] for r in dsl.search(mm_index, body).collect()
    }
    direct = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "alpha beta", fields=["body^2", "title"], k=10, tie_breaker=0.4
        ).collect()
    }
    assert via_dsl == direct
    # type=phrase carries slop through to the sloppy-scored legs
    via_slop = {
        r["doc_id"]: r["score"]
        for r in dsl.search(
            mm_index,
            {"query": {"multi_match": {
                "query": "alpha beta", "fields": ["body^2", "title"],
                "type": "phrase", "tie_breaker": 0.4, "slop": 2,
            }}, "size": 10},
        ).collect()
    }
    direct_slop = {
        r["doc_id"]: r["score"]
        for r in mm_index.multi_match_phrase(
            "alpha beta", fields=["body^2", "title"], k=10,
            tie_breaker=0.4, slop=2,
        ).collect()
    }
    assert via_slop == direct_slop and 2 in via_slop
    # slop stays refused for type=phrase_prefix
    with pytest.raises(dsl.DslError, match="slop"):
        dsl.search(
            mm_index,
            {
                "query": {
                    "multi_match": {
                        "query": "a b",
                        "fields": ["body"],
                        "type": "phrase_prefix",
                        "slop": 2,
                    }
                }
            },
        )
    pp = {
        "query": {
            "multi_match": {
                "query": "alpha be",
                "fields": ["body", "title^3"],
                "type": "phrase_prefix",
                "tie_breaker": 0.5,
            }
        },
        "size": 10,
    }
    via_pp = {r["doc_id"]: r["score"] for r in dsl.search(mm_index, pp).collect()}
    assert via_pp[0] == pytest.approx(3.5)

"""Static-relevance and lookup query family: rank_feature,
distance_feature, pinned, random_score, combined_fields, terms_lookup —
checked against hand computation on a tiny fielded index."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def feature_index(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        # (conv, turn, text, tag, n)
        ("c1", 0, "alpha beta", "red blue", 10),
        ("c1", 1, "alpha alpha gamma", "red", 100),
        ("c2", 0, "beta gamma", "green", 200),
        ("c2", 1, "alpha", "blue green", 400),
        ("c3", 0, "delta", "red", 50),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, tag string, n int"
    )
    out = str(tmp_path_factory.mktemp("feat") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
        text_cols=("text", "tag"), meta_cols=("n", "tag"),
    )
    return InvertedIndex(spark, out)


def _bm25(texts: list[str], terms: list[str]) -> dict[int, float]:
    toks = [t.split() for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    out: dict[int, float] = {}
    for term in terms:
        df = sum(1 for t in toks if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                out[i] = out.get(i, 0.0) + idf * tf / (
                    tf + K1 * (1 - B + B * len(t) / avgdl)
                )
    return out


TEXTS = ["alpha beta", "alpha alpha gamma", "beta gamma", "alpha", "delta"]
NS = [10, 100, 200, 400, 50]


def test_rank_feature_saturation(feature_index):
    base = _bm25(TEXTS, ["alpha"])
    want = {
        d: round(s + NS[d] / (NS[d] + 100.0), 6) for d, s in base.items()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in feature_index.rank_feature(
            "alpha", k=10, on="n", pivot=100.0, round_scores=6
        ).collect()
    }
    assert got == want
    # default pivot = exact geometric mean of positive values
    gm = float(np.exp(np.mean(np.log(NS))))
    want_gm = {
        d: round(s + NS[d] / (NS[d] + gm), 6) for d, s in base.items()
    }
    got_gm = {
        r["doc_id"]: r["score"]
        for r in feature_index.rank_feature(
            "alpha", k=10, on="n", round_scores=6
        ).collect()
    }
    assert got_gm == want_gm
    with pytest.raises(ValueError):
        feature_index.rank_feature("alpha", fn="nope")


def test_rank_feature_log_and_sigmoid(feature_index):
    base = _bm25(TEXTS, ["alpha"])
    want_log = {
        d: round(s + math.log(1.0 + NS[d]), 6) for d, s in base.items()
    }
    got_log = {
        r["doc_id"]: r["score"]
        for r in feature_index.rank_feature(
            "alpha", k=10, on="n", fn="log", round_scores=6
        ).collect()
    }
    assert got_log == want_log
    want_sig = {
        d: round(s + NS[d] ** 2 / (NS[d] ** 2 + 100.0**2), 6)
        for d, s in base.items()
    }
    got_sig = {
        r["doc_id"]: r["score"]
        for r in feature_index.rank_feature(
            "alpha", k=10, on="n", fn="sigmoid", pivot=100.0, exponent=2.0,
            round_scores=6,
        ).collect()
    }
    assert got_sig == want_sig


def test_distance_feature(feature_index):
    base = _bm25(TEXTS, ["alpha"])
    want = {
        d: round(s + 2.0 * 50.0 / (50.0 + abs(NS[d] - 150.0)), 6)
        for d, s in base.items()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in feature_index.distance_feature(
            "alpha", k=10, on="n", origin=150.0, pivot=50.0, boost=2.0,
            round_scores=6,
        ).collect()
    }
    assert got == want
    with pytest.raises(ValueError):
        feature_index.distance_feature("alpha", pivot=0.0)


def test_pinned_order_and_missing_ids(feature_index):
    rows = feature_index.pinned("alpha", ids=[2, 999, 0], k=10).collect()
    # 999 doesn't exist -> dropped; pinned keep GIVEN order, then organic
    assert [r["doc_id"] for r in rows[:2]] == [2, 0]
    assert all(r["pinned"] for r in rows[:2])
    organic = [r["doc_id"] for r in rows[2:]]
    assert 2 not in organic and 0 not in organic
    base = _bm25(TEXTS, ["alpha"])
    best_organic = max(
        (d for d in base if d not in (2, 0)), key=lambda d: (base[d], -d)
    )
    assert organic[0] == best_organic
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    with pytest.raises(ValueError):
        feature_index.pinned("alpha", ids=[])


def test_random_score_deterministic(feature_index):
    a = feature_index.random_score("alpha", seed=7, k=10).collect()
    b = feature_index.random_score("alpha", seed=7, k=10).collect()
    assert a == b
    assert all(0.0 <= r["score"] < 1.0 for r in a)
    c = feature_index.random_score("alpha", seed=8, k=10).collect()
    assert [r["doc_id"] for r in a] != [r["doc_id"] for r in c] or [
        r["score"] for r in a
    ] != [r["score"] for r in c]
    # only matching docs participate
    assert {r["doc_id"] for r in a} == {0, 1, 3}


def test_combined_fields_merged_statistics(feature_index):
    tags = ["red blue", "red", "green", "blue green", "red"]
    merged = [f"{t} {g}" for t, g in zip(TEXTS, tags)]
    want_scores = _bm25(merged, ["alpha", "red"])
    want = {d: round(s, 6) for d, s in want_scores.items()}
    got = {
        r["doc_id"]: r["score"]
        for r in feature_index.combined_fields(
            "alpha red", fields=["text", "tag"], k=10, round_scores=6
        ).collect()
    }
    assert got == want
    with pytest.raises(ValueError):
        feature_index.combined_fields("alpha", fields=[])


def test_terms_lookup(feature_index):
    # doc 0's tag = "red blue" -> docs whose tag has red or blue
    got = [
        r["doc_id"]
        for r in feature_index.terms_lookup((("c1", 0)), "tag",
                                            field="tag").collect()
    ]
    assert got == [0, 1, 3, 4]
    # unknown key -> empty, not an error
    assert feature_index.terms_lookup(("zz", 9), "tag", field="tag").count() == 0


# --- _terms_enum ----------------------------------------------------------
def test_terms_enum_indexed_field(built_index, transcripts_pdf):
    import re

    from dart_importer_spark.functions.tokenizer import TOKEN_PATTERN

    pat = re.compile(TOKEN_PATTERN)
    all_terms = sorted(
        {t for txt in transcripts_pdf["text"] for t in pat.findall(txt.lower())}
    )
    want = [t for t in all_terms if t.startswith("th")][:5]
    got = built_index.terms_enum("text", string="th", size=5).toPandas()
    assert list(got["term"]) == want


def test_terms_enum_meta_column_and_pagination(built_index, transcripts_pdf):
    roles = sorted(transcripts_pdf["role"].unique())
    got = built_index.terms_enum("role", size=100).toPandas()
    assert list(got["term"]) == roles
    # keyset pagination: strictly after the first value
    page2 = built_index.terms_enum(
        "role", size=100, search_after=roles[0]
    ).toPandas()
    assert list(page2["term"]) == roles[1:]


def test_terms_enum_case_insensitive_and_unknown_field(built_index):
    import pytest as _pytest

    ci = built_index.terms_enum("text", string="TH", size=3,
                                case_insensitive=True).toPandas()
    plain = built_index.terms_enum("text", string="th", size=3).toPandas()
    assert list(ci["term"]) == list(plain["term"])
    with _pytest.raises(ValueError, match="terms_enum"):
        built_index.terms_enum("no_such_col")

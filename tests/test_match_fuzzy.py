"""ES match with fuzziness (engine.match_fuzzy): Damerau dictionary
expansion per source term, expansion dfs blended to their max (Lucene
blended freqs), per (doc, source) dis_max over expansions, summed over
source terms. Reference recovery path for hand-typed corp names
(Running-ELK.md:186-200)."""

from __future__ import annotations

import math

import pytest

from dart_importer_spark.index.build import B, K1, BuildConfig, build_index
from dart_importer_spark.query.engine import InvertedIndex
from dart_importer_spark.query import dsl

ROWS = [
    ("c1", 0, "table table chair"),  # 0: common spelling, tf 2
    ("c1", 1, "tabel chair"),        # 1: rare variant
    ("c2", 0, "table tabel"),        # 2: BOTH variants -> dis_max, not sum
    ("c2", 1, "chair lamp"),         # 3: neither
]


@pytest.fixture(scope="module")
def fz_index(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("fuzzymatch") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=())
    return InvertedIndex(spark, out)


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _tfn(tf, dl, avgdl):
    return tf / (tf + K1 * (1 - B + B * dl / avgdl))


def test_blended_df_and_dismax(fz_index):
    # query "tabel" fz=1 -> expansions {tabel, table}; both df 2, blended
    # df 2; n=4, avgdl=(3+2+2+2)/4
    n, avgdl = 4, 2.25
    w = _idf(n, 2)
    want = {
        0: w * _tfn(2, 3, avgdl),           # table tf 2
        1: w * _tfn(1, 2, avgdl),           # tabel tf 1
        2: w * _tfn(1, 2, avgdl),           # BOTH variants: max, not sum
    }
    got = {r["doc_id"]: r["score"]
           for r in fz_index.match_fuzzy("tabel", k=10, fuzziness=1).collect()}
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_operator_and(fz_index):
    # "tabel chair" AND: needs chair AND some {tabel,table} expansion
    got = sorted(
        r["doc_id"]
        for r in fz_index.match_fuzzy(
            "tabel chair", k=10, fuzziness=1, operator="and"
        ).collect()
    )
    assert got == [0, 1]
    # a source term with no expansion empties the AND
    assert fz_index.match_fuzzy(
        "zzzzzz chair", k=10, fuzziness=1, operator="and"
    ).collect() == []
    # ...but OR keeps the other term's matches
    assert sorted(
        r["doc_id"]
        for r in fz_index.match_fuzzy("zzzzzz chair", k=10, fuzziness=1).collect()
    ) == [0, 1, 3]


def test_auto_and_validation(fz_index):
    # AUTO: len("tabel")=5 -> 1 edit, same result as fuzziness=1
    a = [(r["doc_id"], r["score"]) for r in
         fz_index.match_fuzzy("tabel", k=10, fuzziness="AUTO").collect()]
    b = [(r["doc_id"], r["score"]) for r in
         fz_index.match_fuzzy("tabel", k=10, fuzziness=1).collect()]
    assert a == b
    with pytest.raises(ValueError, match="operator"):
        fz_index.match_fuzzy("x", operator="nor")
    assert fz_index.match_fuzzy("", k=5).collect() == []


def test_dsl_fuzziness_dispatch(fz_index):
    body = {"query": {"match": {"text": {"query": "tabel", "fuzziness": 1}}},
            "size": 10}
    via = {r["doc_id"]: r["score"]
           for r in dsl.search(fz_index, body, round_scores=6).collect()}
    direct = {r["doc_id"]: r["score"]
              for r in fz_index.match_fuzzy(
                  "tabel", k=10, fuzziness=1, round_scores=6).collect()}
    assert via == direct

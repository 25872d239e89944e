"""Query-time synonyms — Lucene SynonymQuery semantics: blended (max)
df per group, member tfs summed per doc then saturated ONCE."""

from __future__ import annotations

import math

import pytest


def test_empty_synonyms_equals_plain_match(built_index):
    """With no synonyms every group is a singleton, so SynonymQuery
    degenerates to plain BM25 — pinned equal to the engine's topk."""
    got = built_index.match_synonyms(
        "the w00100", {}, k=10, round_scores=6
    ).collect()
    want = built_index.topk("the w00100", k=10, round_scores=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_synonym_group_sums_tf_and_blends_df(built_index, transcripts_pdf):
    import numpy as np
    from tests.oracle import BM25Oracle

    src = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    )
    src["doc_id"] = np.arange(len(src), dtype=np.int64)
    oracle = BM25Oracle(src)
    g = ["w00100", "w00200"]
    got = built_index.match_synonyms(
        "w00100", {"w00100": ["w00200"]}, k=2000, round_scores=6
    ).toPandas()

    # python recomputation of SynonymQuery: df = max member df,
    # tf = sum of member tfs, one saturation
    k1, b = 1.2, 0.75
    n = len(oracle.tokens)
    avgdl = sum(len(t) for t in oracle.tokens) / n
    df_max = max(
        sum(1 for t in oracle.tokens if m in t) for m in g
    )
    idf = math.log(1 + (n - df_max + 0.5) / (df_max + 0.5))
    want = {}
    for did, toks in zip(oracle.doc_ids, oracle.tokens):
        tf = sum(toks.count(m) for m in g)
        if tf:
            dl = len(toks)
            want[int(did)] = round(
                idf * tf / (tf + k1 * (1 - b + b * dl / avgdl)), 6
            )
    got_map = {int(r.doc_id): r.score for r in got.itertuples()}
    assert got_map == pytest.approx(want)
    assert len(want) > 0


def test_surface_form_synonym_keys_are_analyzed(built_index):
    # dict keys arrive in surface form ('Data'); query tokens arrive
    # analyzed ('data') — keys must be analyzed too or the group silently
    # never expands (regression)
    import pandas as pd

    lower = built_index.match_synonyms(
        "data", {"data": ["merge"]}, k=50
    ).toPandas()
    upper = built_index.match_synonyms(
        "data", {"Data": ["merge"]}, k=50
    ).toPandas()
    pd.testing.assert_frame_equal(lower, upper)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="one term"):
        built_index.match_synonyms("data", {"data merge": ["x"]})

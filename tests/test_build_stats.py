"""Index-build invariants (FIXTURES.md I1-I3) + doc_id stability."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dart_importer_spark.functions.codec import delta_decode, varbyte_decode
from dart_importer_spark.functions.tokenizer import tokenize_text


def test_corpus_stats_match_oracle(built_index, transcripts_pdf):
    toks = [tokenize_text(t) for t in transcripts_pdf["text"]]
    dls = np.array([len(t) for t in toks])
    assert built_index.n_docs == len(transcripts_pdf)
    assert abs(built_index.avgdl - dls.mean()) < 1e-9


def test_term_dict_df_matches_oracle(built_index, transcripts_pdf):
    # I3: df per term == number of docs containing it
    from collections import Counter

    df_oracle = Counter()
    for t in transcripts_pdf["text"]:
        df_oracle.update(set(tokenize_text(t)))
    rows = built_index.term_dict().collect()
    df_engine = {r["term"]: r["df"] for r in rows}
    assert df_engine == dict(df_oracle)


def test_doc_ids_dense_and_stable(built_index, transcripts_pdf):
    ds = built_index.doc_stats().orderBy("doc_id").toPandas()
    n = len(transcripts_pdf)
    assert list(ds["doc_id"]) == list(range(n))
    # stable ordering: doc_id rank == (conv_id, turn_idx) sort order
    expect = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(ds["conv_id"]) == list(expect["conv_id"])
    assert list(ds["turn_idx"]) == list(expect["turn_idx"])


def test_per_turn_text_equality_invariant(built_index, transcripts_pdf):
    """I1 (input_hint): engine doc_id -> (conv_id, turn_idx) -> text must
    round-trip to the source text under stable turn ordering."""
    ds = built_index.doc_stats().select("doc_id", "conv_id", "turn_idx").toPandas()
    src = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    src["doc_id"] = np.arange(len(src), dtype=np.int64)
    merged = ds.merge(src, on=["conv_id", "turn_idx"], suffixes=("", "_src"))
    assert len(merged) == len(src)
    assert (merged["doc_id"] == merged["doc_id_src"]).all()
    # text reachable through the mapping equals source text
    by_id = src.set_index("doc_id")["text"]
    recon = merged.set_index("doc_id").join(by_id.rename("text2"))
    assert (recon["text"] == recon["text2"]).all()


def test_postings_roundtrip_per_term(built_index, transcripts_pdf):
    """Decode every posting run and re-derive (term, doc_id, tf) — must equal
    the oracle's flat postings exactly."""
    rows = built_index.postings().collect()
    engine = {}
    for r in rows:
        docs = delta_decode(r["docs"]).astype(np.int64)
        tfs = varbyte_decode(r["tfs"]).astype(np.int64)
        dls = varbyte_decode(r["dls"]).astype(np.int64)
        assert r["n"] == len(docs) == len(tfs) == len(dls)
        assert r["min_doc"] == docs[0] and r["max_doc"] == docs[-1]
        for d, tf in zip(docs.tolist(), tfs.tolist()):
            key = (r["term"], d)
            assert key not in engine, f"duplicate posting {key}"
            engine[key] = tf
    from collections import Counter

    src = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = {}
    for did, text in enumerate(src["text"]):
        for term, tf in Counter(tokenize_text(text)).items():
            oracle[(term, did)] = tf
    assert engine == oracle


def test_sum_df_equals_distinct_pairs(built_index):
    # I3: sum(df) over term_dict == total distinct (term, doc_id) pairs
    total_df = built_index.term_dict().agg(F.sum("df")).collect()[0][0]
    n_postings = built_index.postings().agg(F.sum("n")).collect()[0][0]
    assert total_df == n_postings

"""PII redaction, contamination audit, repetition signals, and the DSL
wrapper / sparse_vector clauses — exact expectations on small inputs."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.operators.quality import (
    contamination_stats,
    redact_pii,
    repetition_stats,
)


def test_redact_pii(spark):
    rows = [
        (0, "mail bob@example.com or sue@a.io from 10.0.0.1 ring +1 555-123-4567"),
        (1, "no pii here at all"),
        (2, "ip 192.168.001.255 twice 10.1.2.3 done"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        int(r["id"]): r
        for r in redact_pii(df, "text").collect()
    }
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_phones"]) == (2, 1, 1)
    assert got[0]["redacted"] == "mail <EMAIL> or <EMAIL> from <IP> ring <PHONE>"
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (0, 0, 0)
    assert got[1]["redacted"] == "no pii here at all"
    assert got[2]["n_ips"] == 2
    assert got[2]["redacted"] == "ip <IP> twice <IP> done"


def test_redact_pii_order(spark):
    # an email whose local part is numeric must not leave a phone match;
    # digits inside an IP must not be eaten by the phone pattern
    df = spark.createDataFrame(
        [(0, "12345678901@x.com and 10.0.0.1")], "id long, text string"
    )
    r = redact_pii(df, "text").collect()[0]
    assert r["n_emails"] == 1 and r["n_ips"] == 1 and r["n_phones"] == 0
    assert r["redacted"] == "<EMAIL> and <IP>"


def test_contamination_stats(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),          # exact copy
            (1, "x alpha beta gamma delta epsilon zeta y"),      # superset
            (2, "totally clean words nothing shared here now"),  # clean
            (3, "too short"),                                    # < n tokens
        ],
        "id long, text string",
    )
    got = {
        int(r["id"]): r
        for r in contamination_stats(corpus, bench, "id", "text", n=6).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0]["contamination"] == 1.0
    # doc 1: 3 six-grams, the middle one is the benchmark's
    assert got[1]["n_ngrams"] == 3 and got[1]["n_contaminated"] == 1
    assert got[2]["n_contaminated"] == 0 and got[2]["contamination"] == 0.0
    with pytest.raises(ValueError):
        contamination_stats(corpus, bench, "id", "text", n=0)


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (0, "buy now buy now buy now"),   # loops
            (1, "a b c d e f"),               # no repeats
        ],
        "id long, text string",
    )
    got = {
        int(r["id"]): r for r in repetition_stats(df, "id", "text", n=2).collect()
    }
    # doc 0 bigrams: [buy now]x3, [now buy]x2 -> 5 total, 2 distinct
    assert got[0]["n_ngrams"] == 5
    assert got[0]["dup_frac"] == 0.6
    assert got[0]["top_frac"] == 0.6
    assert got[1]["dup_frac"] == 0.0 and got[1]["top_frac"] == 0.2
    with pytest.raises(ValueError):
        repetition_stats(df, "id", "text", n=0)


def test_dsl_wrapper_and_sparse_vector(built_index):
    inner = base64.b64encode(
        json.dumps({"match": {"text": "the and"}}).encode()
    ).decode()
    a = built_index.search({"query": {"wrapper": {"query": inner}}, "size": 5})
    b = built_index.search({"query": {"match": {"text": "the and"}}, "size": 5})
    assert [(r["doc_id"], r["score"]) for r in a.collect()] == [
        (r["doc_id"], r["score"]) for r in b.collect()
    ]
    sv = built_index.search(
        {"query": {"sparse_vector": {"field": "text",
                                     "tokens": {"the": 2.0, "and": 1.0}}},
         "size": 5}
    )
    direct = built_index.sparse_vector({"the": 2.0, "and": 1.0}, k=5)
    assert [(r["doc_id"], r["score"]) for r in sv.collect()] == [
        (r["doc_id"], r["score"]) for r in direct.collect()
    ]
    # text_expansion legacy shape routes to the same scorer
    te = built_index.search(
        {"query": {"text_expansion": {"text": {"tokens": {"the": 2.0,
                                                          "and": 1.0}}}},
         "size": 5}
    )
    assert [r["doc_id"] for r in te.collect()] == [
        r["doc_id"] for r in direct.collect()
    ]


def test_dsl_wrapper_errors(built_index):
    from dart_importer_spark.query.dsl import DslError

    with pytest.raises(DslError):
        built_index.search({"query": {"wrapper": {"query": "!!notb64!!"}}})
    with pytest.raises(DslError):
        built_index.search({"query": {"wrapper": {}}})
    with pytest.raises(DslError):
        built_index.search(
            {"query": {"sparse_vector": {"field": "text"}}}  # no tokens
        )


def test_search_track_total_hits_and_fields(built_index):
    got = built_index.search(
        {"query": {"match": {"text": "the"}}, "size": 3,
         "track_total_hits": True}
    ).toPandas()
    assert len(got) == 3
    total = got["total_hits"].iloc[0]
    assert (got["total_hits"] == total).all()
    # the attached total is the full match-set count, not the page size
    assert total == built_index.count_query("the")
    # fields API rides the stored-column join; dict and string forms mix
    got2 = built_index.search(
        {"query": {"match": {"text": "the"}}, "size": 2,
         "fields": ["role", {"field": "ts"}]}
    ).toPandas()
    assert {"role", "ts"}.issubset(got2.columns) and len(got2) == 2

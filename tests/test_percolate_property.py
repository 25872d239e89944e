"""Randomized percolator property test: the distributed one-pass
tokenize+broadcast-join evaluation must agree with a direct per-(query,
doc) python evaluation of the same clause semantics on every batch."""

from __future__ import annotations

import random

import pytest

from dart_importer_spark.functions.tokenizer import tokenize_text
from dart_importer_spark.operators.percolate import percolate


def _py_matches(spec: dict, toks: list[str]) -> tuple[bool, int]:
    tset = set(toks)
    must = sorted({t for v in spec.get("must", []) for t in tokenize_text(v)})
    should = sorted({t for v in spec.get("should", []) for t in tokenize_text(v)})
    nots = sorted({t for v in spec.get("must_not", []) for t in tokenize_text(v)})
    phrase = tokenize_text(spec["phrase"]) if spec.get("phrase") else []
    msm = spec.get(
        "minimum_should_match",
        1 if (should and not must and not phrase) else 0,
    )
    n_must = len([t for t in must if t in tset])
    n_should = len([t for t in should if t in tset])
    if n_must < len(must) or n_should < msm:
        return False, 0
    if any(t in tset for t in nots):
        return False, 0
    if phrase:
        n = len(phrase)
        hit = any(toks[i : i + n] == phrase for i in range(len(toks) - n + 1))
        if not hit:
            return False, 0
    return True, n_must + n_should


@pytest.mark.parametrize("seed", [0, 1])
def test_percolate_matches_python_oracle(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
        for i in range(40)
    ]
    queries: dict[str, dict] = {}
    for qi in range(12):
        spec: dict = {}
        kinds = rng.sample(["must", "should", "must_not", "phrase"],
                           rng.randint(1, 3))
        for kind in kinds:
            if kind == "phrase":
                spec["phrase"] = " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(2, 3))
                )
            else:
                spec[kind] = rng.sample(vocab, rng.randint(1, 3))
        if "should" in spec and rng.random() < 0.5:
            lo = 1 if not (spec.get("must") or spec.get("phrase")) else 0
            spec["minimum_should_match"] = rng.randint(
                max(lo, 1), len(spec["should"])
            )
        if not spec:
            spec = {"must": [rng.choice(vocab)]}
        queries[f"q{qi}"] = spec

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["query_id"], r["doc_id"]): r["n_matched"]
        for r in percolate(spark, queries, df).collect()
    }
    want = {}
    for qid, spec in queries.items():
        for did, text in docs:
            ok, nm = _py_matches(spec, tokenize_text(text))
            if ok:
                want[(qid, did)] = nm
    assert got == want
    # the shuffle-join rule path (rule sets past broadcast size) must be
    # result-identical to the broadcast default
    if seed == 0:
        shuffled = {
            (r["query_id"], r["doc_id"]): r["n_matched"]
            for r in percolate(
                spark, queries, df, broadcast_rules=False
            ).collect()
        }
        assert shuffled == want

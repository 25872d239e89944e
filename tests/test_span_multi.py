"""span_multi (multi-term queries in span context) + field_masking_span
(cross-field span composition) — ES's last two span-family clauses.

Semantics checked against a brute-force evaluator that generalizes the
test_spans_pipeline one to per-slot ALTERNATIVES and per-slot FIELDS:
one position per slot (any alternative term, read from the slot's own
field token list — Lucene compares masked positions as-is), distinct
positions, (max - min + 1) - n <= slop, strictly increasing when
in_order. Reference span composition context: the bool/phrase transcript
queries of Running-ELK.md:230-247."""

from __future__ import annotations

import itertools
import random

import pytest

from dart_importer_spark.index.build import BuildConfig, build_index
from dart_importer_spark.query.dsl import search
from dart_importer_spark.query.engine import InvertedIndex

ROWS = [
    # (conv_id, turn_idx, body, title) — doc_id = rank of (conv_id, turn_idx)
    ("c1", 0, "alpha beta gamma", "red alpha"),        # doc 0
    ("c1", 1, "alpine x x beta", "blue beta"),         # doc 1
    ("c2", 0, "beta alpha", "red gamma"),              # doc 2
    ("c2", 1, "altitude x beta gamma", "green alpha"),  # doc 3
    ("c3", 0, "alpha", "alpha beta"),                  # doc 4
    ("c3", 1, "gamma beta alpine", "red blue"),        # doc 5
]


@pytest.fixture(scope="module")
def sm_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, body string, title string"
    )
    out = str(tmp_path_factory.mktemp("spanmulti") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        text_cols=("body", "title"),
        meta_cols=(),
    )
    return InvertedIndex(spark, out)


def brute_slots(fields_tokens: dict[str, list[str]],
                slots: list[tuple[list[str], str]],
                slop: int, in_order: bool) -> bool:
    """One position per slot: any alternative term, from the slot's own
    field's token list; distinct positions; width/order window rule."""
    pos_lists = [
        [i for i, t in enumerate(fields_tokens[f]) if t in set(alts)]
        for alts, f in slots
    ]
    if any(not pl for pl in pos_lists):
        return False
    n = len(slots)
    for combo in itertools.product(*pos_lists):
        if len(set(combo)) != n:
            continue
        if in_order and any(combo[i] >= combo[i + 1] for i in range(n - 1)):
            continue
        if (max(combo) - min(combo) + 1) - n <= slop:
            return True
    return False


def _docs(df):
    return [r["doc_id"] for r in df.collect()]


def test_expand_span_multi_kinds(sm_index):
    assert sm_index.expand_span_multi({"prefix": {"body": "alp"}}) == [
        "alpha", "alpine"
    ]
    assert sm_index.expand_span_multi(
        {"wildcard": {"body": {"value": "al*e"}}}
    ) == ["alpine", "altitude"]
    assert sm_index.expand_span_multi(
        {"regexp": {"body": {"value": "al.*"}}}
    ) == ["alpha", "alpine", "altitude"]
    # fuzzy: 'alpha' at AUTO (len 5 -> 1 edit) reaches 'alpha' only
    # ('alpine' is 2 edits away)
    assert sm_index.expand_span_multi({"fuzzy": {"body": "alpha"}}) == [
        "alpha"
    ]
    # the mandatory cap is lexicographic-first and deterministic
    assert sm_index.expand_span_multi(
        {"regexp": {"body": {"value": "al.*"}}}, max_expansions=2
    ) == ["alpha", "alpine"]


def test_span_multi_standalone_equals_wildcard(sm_index):
    got = _docs(sm_index.span_multi({"prefix": {"body": "alp"}}, k=100))
    want = sorted(
        {r["doc_id"] for r in sm_index.wildcard("alp", k=100).collect()}
    )
    assert got == want == [0, 1, 2, 4, 5]


def test_span_multi_unsupported_inner(sm_index):
    with pytest.raises(ValueError, match="unsupported inner"):
        sm_index.span_multi({"range": {"body": {"gte": "a"}}})
    with pytest.raises(ValueError, match="exactly one inner"):
        sm_index.span_multi({})


def test_span_near_slots_matches_span_near(sm_index):
    # single-term slots are exactly span_near (the refactor is an identity)
    for clauses, slop, in_order in [
        (["beta", "gamma"], 0, True),
        (["alpha", "beta"], 2, True),
        (["gamma", "alpha"], 3, False),
    ]:
        a = _docs(sm_index.span_near(clauses, slop=slop,
                                     in_order=in_order, k=100))
        b = _docs(sm_index.span_near_slots(clauses, slop=slop,
                                           in_order=in_order, k=100))
        assert a == b, (clauses, slop, in_order)


def test_span_near_with_multi_slot_brute(sm_index):
    # slot 0: any alp*-prefixed term; slot 1: the literal beta
    alts = sm_index.expand_span_multi({"prefix": {"body": "alp"}})
    for slop in (0, 1, 2):
        for in_order in (True, False):
            got = _docs(sm_index.span_near_slots(
                [alts, "beta"], slop=slop, in_order=in_order, k=100
            ))
            want = [
                i for i, row in enumerate(ROWS)
                if brute_slots(
                    {"body": row[2].split(), "title": row[3].split()},
                    [(alts, "body"), (["beta"], "body")],
                    slop, in_order,
                )
            ]
            assert got == want, (slop, in_order)


def test_span_near_slots_missing_alternative_slot(sm_index):
    # a slot none of whose alternatives exist -> no hits
    assert _docs(sm_index.span_near_slots(
        [["zzz", "qqq"], "beta"], slop=5, in_order=False, k=100
    )) == []


def test_field_masking_span_brute(sm_index):
    # body:"beta" near title:"alpha" — masked positions compared as-is
    for slop in (0, 1, 3):
        for in_order in (True, False):
            got = _docs(sm_index.span_near_slots(
                [("beta", None), (["alpha"], "title")],
                slop=slop, in_order=in_order, k=100,
            ))
            want = [
                i for i, row in enumerate(ROWS)
                if brute_slots(
                    {"body": row[2].split(), "title": row[3].split()},
                    [(["beta"], "body"), (["alpha"], "title")],
                    slop, in_order,
                )
            ]
            assert got == want, (slop, in_order)


def test_randomized_slots_brute(sm_index, spark, tmp_path_factory):
    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    rows = [
        ("r", i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("spanrand") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        meta_cols=(),
    )
    ix = InvertedIndex(spark, out)
    for trial in range(6):
        n = rng.randint(2, 3)
        slots = [
            sorted(rng.sample(vocab, rng.randint(1, 2))) for _ in range(n)
        ]
        slop = rng.randint(0, 3)
        in_order = rng.random() < 0.5
        got = _docs(ix.span_near_slots(slots, slop=slop,
                                       in_order=in_order, k=1000))
        want = [
            i for i, row in enumerate(rows)
            if brute_slots(
                {"text": row[2].split()},
                [(alts, "text") for alts in slots],
                slop, in_order,
            )
        ]
        assert got == want, (trial, slots, slop, in_order)


def test_dsl_span_multi_and_masking(sm_index):
    hits = search(sm_index, {
        "query": {"span_multi": {
            "match": {"prefix": {"body": {"value": "alp"}}}
        }},
        "size": 100,
    })
    assert _docs(hits) == [0, 1, 2, 4, 5]

    near = search(sm_index, {
        "query": {"span_near": {
            "clauses": [
                {"span_multi": {
                    "match": {"prefix": {"body": {"value": "alp"}}}
                }},
                {"span_term": {"body": "beta"}},
            ],
            "slop": 2, "in_order": True,
        }},
        "size": 100,
    })
    alts = sm_index.expand_span_multi({"prefix": {"body": "alp"}})
    want = [
        i for i, row in enumerate(ROWS)
        if brute_slots(
            {"body": row[2].split()},
            [(alts, "body"), (["beta"], "body")], 2, True,
        )
    ]
    assert _docs(near) == want

    masked = search(sm_index, {
        "query": {"span_near": {
            "clauses": [
                {"span_term": {"body": "beta"}},
                {"field_masking_span": {
                    "query": {"span_term": {"title": "alpha"}},
                    "field": "body",
                }},
            ],
            "slop": 3, "in_order": False,
        }},
        "size": 100,
    })
    want = [
        i for i, row in enumerate(ROWS)
        if brute_slots(
            {"body": row[2].split(), "title": row[3].split()},
            [(["beta"], "body"), (["alpha"], "title")], 3, False,
        )
    ]
    assert _docs(masked) == want


def test_span_multi_slot_keeps_inner_field(sm_index):
    # regression: the span_multi slot used to drop its inner query's
    # field, so terms expanded from the TITLE dictionary were
    # position-scanned on the default field (body). The slot must carry
    # (terms, 'title') — Lucene reads a span_multi's positions from the
    # inner query's own field (field-masking comparison vs the body
    # span_term).
    near = search(sm_index, {
        "query": {"span_near": {
            "clauses": [
                {"span_multi": {
                    "match": {"prefix": {"title": {"value": "al"}}}
                }},
                {"span_term": {"body": "beta"}},
            ],
            "slop": 0, "in_order": True,
        }},
        "size": 100,
    })
    alts = sm_index.expand_span_multi({"prefix": {"title": "al"}})
    assert alts == ["alpha"]
    want = [
        i for i, row in enumerate(ROWS)
        if brute_slots(
            {"title": row[3].split(), "body": row[2].split()},
            [(alts, "title"), (["beta"], "body")], 0, True,
        )
    ]
    assert want == [3]  # the hand-computed discriminating doc
    assert _docs(near) == want

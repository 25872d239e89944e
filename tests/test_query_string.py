"""simple_query_string: clause lexer, per-clause contribution scoring,
AND/OR gating (including the all-bare-terms gate applying to the WHOLE doc,
not just the bare contribution), negation, and prefix clauses."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dart_importer_spark.index.build import BuildConfig, build_index
from dart_importer_spark.query.engine import InvertedIndex
from tests.oracle import BM25Oracle

ROWS = [
    ("c1", 0, "alpha beta gamma"),
    ("c1", 1, "beta alpha delta"),
    ("c2", 0, "alpha x beta window"),
    ("c2", 1, "gamma delta"),
    ("c3", 0, "alphabet soup"),
    ("c3", 1, "alpha beta window"),
]
# doc_id = rank under (conv_id, turn_idx): 0..5 in ROWS order


@pytest.fixture(scope="module")
def sqs_index(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("sqs") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        meta_cols=(),
    )
    return InvertedIndex(spark, out)


@pytest.fixture(scope="module")
def oracle():
    pdf = pd.DataFrame(ROWS, columns=["conv_id", "turn_idx", "text"])
    pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
    return BM25Oracle(pdf)


def _got(df):
    return {int(r["doc_id"]): round(float(r["score"]), 9) for r in df.collect()}


def test_parse_clauses():
    assert InvertedIndex.parse_simple_query(
        '-"a b" c* word -neg "p q" -pre*'
    ) == [
        ("phrase", "a b", True),
        ("prefix", "c", False),
        ("term", "word", False),
        ("term", "neg", True),
        ("phrase", "p q", False),
        ("prefix", "pre", True),
    ]
    # bare '*' and empty quotes are dropped, not clauses
    assert InvertedIndex.parse_simple_query('* ""') == []


def test_or_mode_term_plus_phrase(sqs_index, oracle):
    got = _got(sqs_index.simple_query_string('gamma "alpha beta"', k=10))
    # phrase "alpha beta" hits docs 0 and 5 (2 is gapped, 1 is reversed)
    exp: dict[int, float] = {}
    g = oracle.scores("gamma")
    for did, sc in zip(g["doc_id"], g["score"]):
        exp[int(did)] = exp.get(int(did), 0.0) + float(sc)
    ab = oracle.scores("alpha beta")
    for did, sc in zip(ab["doc_id"], ab["score"]):
        if int(did) in (0, 5):
            exp[int(did)] = exp.get(int(did), 0.0) + float(sc)
    assert set(got) == set(exp)
    for did in exp:
        assert got[did] == pytest.approx(exp[did], abs=1e-9)


def test_and_mode_gates_on_every_clause(sqs_index, oracle):
    # phrase "beta alpha" only in doc 1; delta in docs 1 and 3 -> doc 1 only
    got = _got(
        sqs_index.simple_query_string(
            'delta "beta alpha"', k=10, default_operator="and"
        )
    )
    assert list(got) == [1]
    d = oracle.scores("delta")
    ba = oracle.scores("alpha beta")
    exp = float(d[d["doc_id"] == 1]["score"].iloc[0]) + float(
        ba[ba["doc_id"] == 1]["score"].iloc[0]
    )
    assert got[1] == pytest.approx(exp, abs=1e-9)


def test_and_mode_phrase_only_doc_is_gated_out(sqs_index):
    # doc 3 has gamma+delta but not the phrase; docs 0/5 have the phrase but
    # not delta -> AND of both clauses matches nothing. (Regression: the
    # bare-terms gate must apply to phrase-matching docs too.)
    assert (
        sqs_index.simple_query_string(
            'delta "alpha beta"', k=10, default_operator="and"
        ).count()
        == 0
    )


def test_negation_excludes(sqs_index):
    got = _got(sqs_index.simple_query_string("alpha -window", k=10))
    assert set(got) == {0, 1}  # docs 2 and 5 contain window


def test_negated_phrase_excludes_only_phrase_docs(sqs_index):
    got = _got(sqs_index.simple_query_string('beta -"alpha beta"', k=10))
    # beta in 0,1,2,5; phrase in 0,5 -> 1,2 remain
    assert set(got) == {1, 2}


def test_prefix_clause_constant_score(sqs_index):
    got = _got(sqs_index.simple_query_string("alph*", k=10))
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 4: 1.0, 5: 1.0}


def test_and_mode_missing_term_empty(sqs_index):
    assert (
        sqs_index.simple_query_string(
            "alpha zzzmissing", k=10, default_operator="and"
        ).count()
        == 0
    )


def test_or_mode_missing_term_ignored(sqs_index, oracle):
    got = _got(sqs_index.simple_query_string("alpha zzzmissing", k=10))
    a = oracle.scores("alpha")
    assert set(got) == set(int(d) for d in a["doc_id"])


# ------------------------------------------------------- regexp + suggesters
def test_regexp_constant_score(sqs_index):
    got = _got(sqs_index.regexp("al.*a", k=10))
    # anchored: matches alpha (docs 0,1,2,5) but NOT alphabet
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 5: 1.0}
    # unanchored fragment matches nothing (ES implicit anchoring)
    assert sqs_index.regexp("lph", k=10).count() == 0


def test_regexp_cap_is_lexicographic(sqs_index):
    # '.*a' matches alpha, beta, gamma, delta; cap 1 keeps 'alpha' only
    got = _got(sqs_index.regexp(".*a", k=10, max_expansions=1))
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 5: 1.0}


def test_suggest_ranks_by_dist_then_df(sqs_index):
    rows = [
        (r["term"], r["dist"], r["df"])
        for r in sqs_index.suggest_terms("bata", k=5, max_dist=2).collect()
    ]
    # dist 1: beta(df 4); dist 2: data? no 'data' term here -> gamma/delta at 2
    assert rows[0][0] == "beta" and rows[0][1] == 1
    dists = [d for _, d, _ in rows]
    assert dists == sorted(dists)
    for (t1, d1, f1), (t2, d2, f2) in zip(rows, rows[1:]):
        assert (d1, -f1, t1) <= (d2, -f2, t2)


def test_suggest_exact_term_is_distance_zero(sqs_index):
    rows = sqs_index.suggest_terms("alpha", k=3).collect()
    assert rows[0]["term"] == "alpha" and rows[0]["dist"] == 0


# ------------------------------------------------------------ more_like_this
def test_mlt_min_term_freq_filters_seed_terms(sqs_index):
    # only alpha repeats in the seed -> the query degenerates to topk("alpha")
    got = _got(
        sqs_index.more_like_this(
            "alpha alpha beta zzz", k=10, min_term_freq=2, min_doc_freq=1
        )
    )
    want = _got(sqs_index.topk("alpha", k=10))
    assert got == want


def test_mlt_ranks_by_tfidf_and_caps_terms(sqs_index):
    # beta (df 4) and gamma (df 2) both have seed tf 2; idf(gamma) wins the
    # single max_query_terms slot
    got = _got(
        sqs_index.more_like_this(
            "beta beta gamma gamma", k=10,
            min_term_freq=2, min_doc_freq=1, max_query_terms=1,
        )
    )
    assert got == _got(sqs_index.topk("gamma", k=10))


def test_mlt_min_should_match_gates(sqs_index):
    got = _got(
        sqs_index.more_like_this(
            "alpha beta delta", k=10,
            min_term_freq=1, min_doc_freq=1, min_should_match=3,
        )
    )
    assert got == _got(
        sqs_index.topk("alpha beta delta", k=10, min_should_match=3)
    )


def test_mlt_min_doc_freq_and_empty(sqs_index):
    # every candidate term has corpus df < 100 -> nothing selectable
    assert (
        sqs_index.more_like_this(
            "alpha alpha beta beta", k=10, min_term_freq=1, min_doc_freq=100
        ).count()
        == 0
    )
    assert sqs_index.more_like_this("", k=10).count() == 0


# ------------------------------------------------------------------ msearch
def test_msearch_matches_per_query_topk(built_index):
    queries = {"q1": "the and", "q2": "w00042", "q3": "삼성 전자"}
    got = built_index.msearch(queries, k=5, round_scores=6).toPandas()
    for qid, q in queries.items():
        want = built_index.topk(q, k=5, round_scores=6).toPandas()
        mine = got[got["query_id"] == qid]
        assert list(mine["doc_id"]) == list(want["doc_id"]), qid
        assert list(mine["score"]) == list(want["score"]), qid


def test_msearch_and_mode_and_missing_terms(built_index):
    queries = {"a": "the and", "b": "the zzqmissing"}
    got = built_index.msearch(queries, k=5, mode="and", round_scores=6).toPandas()
    want_a = built_index.topk("the and", k=5, mode="and", round_scores=6).toPandas()
    mine_a = got[got["query_id"] == "a"]
    assert list(mine_a["doc_id"]) == list(want_a["doc_id"])
    # query b can never match ALL its analyzed terms -> zero rows
    assert (got["query_id"] == "b").sum() == 0
    with pytest.raises(ValueError):
        built_index.msearch({"x": "the"}, mode="not")


# ------------------------------------------------------- explain + rescore
def test_explain_per_term_breakdown(sqs_index, oracle):
    rows = sqs_index.explain(
        "alpha gamma zmissing", "c1", 0, round_scores=None
    ).collect()
    assert [r["term"] for r in rows] == ["alpha", "gamma"]
    for r in rows:
        t = r["term"]
        assert r["df"] == oracle.df[t]
        assert r["idf"] == pytest.approx(oracle.idf(t), abs=1e-12)
        # contribution equals the oracle's single-term score for doc 0
        s = oracle.scores(t)
        want = float(s[s["doc_id"] == 0]["score"].iloc[0])
        assert r["contribution"] == pytest.approx(want, abs=1e-9)
    # sum of contributions == the doc's topk score for the present terms
    total = sum(r["contribution"] for r in rows)
    s2 = oracle.scores("alpha gamma")
    assert total == pytest.approx(
        float(s2[s2["doc_id"] == 0]["score"].iloc[0]), abs=1e-9
    )
    # unknown doc key -> empty
    assert sqs_index.explain("alpha", "zz", 9).count() == 0


def test_rescore_phrase_bonus_reranks(sqs_index, oracle):
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in sqs_index.rescore(
            "beta", '"alpha beta"', k=10, window_size=10, weight=5.0
        ).collect()
    ]
    s = oracle.scores("beta")
    base = dict(zip((int(d) for d in s["doc_id"]), (float(x) for x in s["score"])))
    want = sorted(
        (
            (did, round(sc + (5.0 if did in (0, 5) else 0.0), 9))
            for did, sc in base.items()
        ),
        key=lambda r: (-r[1], r[0]),
    )
    assert got == want
    # phrase docs rose to the top
    assert {got[0][0], got[1][0]} == {0, 5}


# ------------------------------------------------------- property (hypothesis)
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_parse_simple_query_total(q):
    """The lexer is total: any input yields a clause list with valid kinds
    and non-empty payloads, never an exception."""
    out = InvertedIndex.parse_simple_query(q)
    for kind, payload, neg in out:
        assert kind in ("term", "phrase", "prefix")
        assert isinstance(payload, str) and (payload or kind == "phrase")
        assert isinstance(neg, bool)


VOCAB = ["alpha", "beta", "gamma", "delta", "window", "soup", "zzqmissing"]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3),
        min_size=1, max_size=3,
    )
)
def test_msearch_equivalence_property(sqs_index, query_term_lists):
    """msearch == per-query topk for random query sets over the corpus
    vocabulary (including absent terms)."""
    queries = {f"q{i}": " ".join(ts) for i, ts in enumerate(query_term_lists)}
    got = sqs_index.msearch(queries, k=4, round_scores=6).toPandas()
    for qid, q in queries.items():
        want = sqs_index.topk(q, k=4, round_scores=6).toPandas()
        mine = got[got["query_id"] == qid]
        assert list(mine["doc_id"]) == list(want["doc_id"]), (qid, q)
        assert list(mine["score"]) == list(want["score"]), (qid, q)


def test_prefix_clause_multi_token_is_conjunctive(sqs_index, oracle):
    # 'gamma.bet*' = one clause: gamma present AND some bet* term present.
    # gamma docs {0,3} ∩ beta-prefix docs {0,1,2,5} -> only doc 0.
    got = _got(sqs_index.simple_query_string("gamma.bet*", k=10))
    assert set(got) == {0}
    g = oracle.scores("gamma")
    want = 1.0 + float(g[g["doc_id"] == 0]["score"].iloc[0])
    assert got[0] == pytest.approx(want, abs=1e-9)
    # negated form excludes exactly the clause's conjunctive match set
    neg = _got(sqs_index.simple_query_string('beta -gamma.bet*', k=10))
    assert set(neg) == {1, 2, 5}


def test_count_query_modes(sqs_index):
    assert sqs_index.count_query("alpha beta") == 4  # docs 0,1,2,5
    assert sqs_index.count_query("alpha beta", mode="and") == 4
    assert sqs_index.count_query("alpha gamma", mode="and") == 1  # doc 0
    assert sqs_index.count_query("zzq") == 0
    with pytest.raises(ValueError):
        sqs_index.count_query("alpha", mode="OR")


# ---------------------------------------------------- full query_string (AST)
def test_qs_parser_shapes():
    P = InvertedIndex.parse_query_string
    assert P("a b") == ("or", [("term", "a"), ("term", "b")])
    assert P("a b", "and") == ("and", [("term", "a"), ("term", "b")])
    assert P("a OR b AND c") == (
        "or", [("term", "a"), ("and", [("term", "b"), ("term", "c")])]
    )
    assert P("(a OR b) AND NOT c") == (
        "and",
        [("or", [("term", "a"), ("term", "b")]), ("not", ("term", "c"))],
    )
    assert P('"x y" AND pre*') == (
        "and", [("phrase", "x y"), ("prefix", "pre")]
    )


def test_qs_boolean_gating(sqs_index, oracle):
    got = _got(sqs_index.query_string("(alpha AND delta) OR gamma", k=10))
    assert set(got) == {0, 1, 3}
    # score = sum of positive-leaf BM25 present in each gated doc
    for did in got:
        want = 0.0
        for t in ("alpha", "delta", "gamma"):
            s = oracle.scores(t)
            m = s[s["doc_id"] == did]
            if len(m):
                want += float(m["score"].iloc[0])
        assert got[did] == pytest.approx(want, abs=1e-9)


def test_qs_not_and_phrase(sqs_index):
    assert set(_got(sqs_index.query_string("NOT alpha", k=10))) == {3, 4}
    got = _got(sqs_index.query_string('beta AND NOT "alpha beta"', k=10))
    assert set(got) == {1, 2}
    # precedence: AND binds tighter than the implicit OR
    got2 = _got(sqs_index.query_string("delta OR alpha AND window", k=10))
    assert set(got2) == {1, 2, 3, 5}


def test_qs_pure_negation_scores_one(sqs_index):
    got = _got(sqs_index.query_string("NOT alpha AND NOT beta", k=10))
    assert got == {3: 1.0, 4: 1.0}


def test_terms_set_per_doc_minimum(built_index, spark, transcripts_pdf):
    """terms_set: each doc's required-match count comes from its own
    doc_stats column (turn_idx here: doc at turn t needs >= t matches)."""
    import numpy as np

    from dart_importer_spark.functions.tokenizer import tokenize_text

    terms = ["the", "and", "w00042"]
    got = {
        r["doc_id"]: r["n_matched"]
        for r in built_index.terms_set(
            terms, min_match_col="turn_idx", k=100000
        ).collect()
    }
    src = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = {}
    for did, (text, need) in enumerate(zip(src["text"], src["turn_idx"])):
        toks = set(tokenize_text(text))
        n = sum(1 for t in terms if t in toks)
        if n > 0 and n >= need:
            want[did] = n
    assert got == want
    assert built_index.terms_set([], "turn_idx").count() == 0


def test_qs_parser_parenthesized_adjacency_and_errors():
    P = InvertedIndex.parse_query_string
    assert P("(data merge) AND filter") == (
        "and",
        [("or", [("term", "data"), ("term", "merge")]), ("term", "filter")],
    )
    assert P("a AND (b c)") == (
        "and", [("term", "a"), ("or", [("term", "b"), ("term", "c")])]
    )
    assert P("") is None
    for bad in ("a AND", "NOT", "(", "a OR"):
        with pytest.raises(ValueError):
            P(bad)


def test_qs_parenthesized_adjacency_results(sqs_index):
    # (delta gamma) AND alpha = (delta OR gamma) AND alpha -> docs 0, 1
    got = _got(sqs_index.query_string("(delta gamma) AND alpha", k=10))
    assert set(got) == {0, 1}
    assert sqs_index.query_string("", k=5).count() == 0


def test_multi_match_boost_validation(sqs_index):
    with pytest.raises(ValueError, match="boost"):
        sqs_index.multi_match("alpha", ["text^-2"], k=5)
    with pytest.raises(ValueError, match="malformed"):
        sqs_index.multi_match("alpha", ["text^two"], k=5)


def test_boosting_demotes_not_excludes(sqs_index, oracle):
    got = _got(sqs_index.boosting("alpha beta", "window", 0.5, k=10))
    s = oracle.scores("alpha beta")
    want = {}
    for did, sc in zip(s["doc_id"], s["score"]):
        f = 0.5 if int(did) in (2, 5) else 1.0  # docs containing window
        want[int(did)] = round(float(sc) * f, 9)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)
    # demoted docs are still PRESENT (vs must_not exclusion)
    assert {2, 5} <= set(got)
    with pytest.raises(ValueError):
        sqs_index.boosting("alpha", "window", negative_boost=2.0)


# ------------------------------------------------------------ field scoping
def test_parse_field_scoping_forms():
    p = InvertedIndex.parse_query_string
    assert p("lang:en") == ("field", "lang", ("term", "en"))
    assert p("title:alp*") == ("field", "title", ("prefix", "alp"))
    assert p('title:"a b"') == ("field", "title", ("phrase", "a b"))
    assert p("title:(a OR b)") == (
        "field", "title", ("or", [("term", "a"), ("term", "b")])
    )
    # the field binds to the immediately following group only (ES/Lucene)
    assert p("title:a b") == (
        "or", [("field", "title", ("term", "a")), ("term", "b")]
    )
    # a colon token not shaped like a field name stays a term
    assert p("12:30") == ("term", "12:30")
    with pytest.raises(ValueError):
        p("title: AND x")


def test_field_scope_with_no_value_raises():
    with pytest.raises(ValueError):
        InvertedIndex.parse_query_string("title:")


# ------------------------------------------------------------ boosts, exists
def test_parse_boost_forms():
    p = InvertedIndex.parse_query_string
    assert p("quick^2") == ("boost", 2.0, ("term", "quick"))
    assert p("pre*^1.5") == ("boost", 1.5, ("prefix", "pre"))
    assert p('"a b"^3') == ("boost", 3.0, ("phrase", "a b"))
    assert p("(a b)^2") == (
        "boost", 2.0, ("or", [("term", "a"), ("term", "b")])
    )
    assert p("title:(a)^2") == ("boost", 2.0, ("field", "title", ("term", "a")))
    assert p("_exists_:lang") == ("exists", "lang")
    # ^ inside a word that is not a boost suffix stays part of the term
    assert p("a^b") == ("term", "a^b")


def test_query_string_boost_scales_score(sqs_index):
    base = {
        int(r["doc_id"]): float(r["score"])
        for r in sqs_index.query_string("alpha", k=10).collect()
    }
    boosted = {
        int(r["doc_id"]): float(r["score"])
        for r in sqs_index.query_string("alpha^2", k=10).collect()
    }
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert abs(boosted[d] - 2 * s) < 1e-9


def test_query_string_exists_gates(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index

    rows = [
        ("c1", 0, "alpha beta", "t1"),
        ("c1", 1, "alpha gamma", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, tag string"
    )
    out = str(tmp_path_factory.mktemp("qse") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("tag",))
    ix = InvertedIndex(spark, out)
    got = {int(r["doc_id"]) for r in ix.query_string("alpha AND _exists_:tag", k=10).collect()}
    assert got == {0}
    # pure exists: filter context, constant score
    rows = ix.query_string("_exists_:tag", k=10).collect()
    assert {int(r["doc_id"]) for r in rows} == {0}
    assert all(float(r["score"]) == 1.0 for r in rows)
    with pytest.raises(KeyError):
        ix.query_string("_exists_:nosuchcol", k=5).collect()

"""Round-4 additions: span_near / span_first (positional proximity),
date_histogram pipeline aggs (cumulative_sum / derivative / moving_fn),
bucket_sort, decay_score, match_bool_prefix.

span_near semantics (unit-width spans): one position per clause with
(max - min + 1) - n <= slop, strictly increasing when in_order — checked
against a brute-force Python evaluator on both crafted and randomized
corpora (the Lucene SpanNearQuery reduction for single-term clauses)."""

from __future__ import annotations

import itertools
import random
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.index.build import BuildConfig, build_index
from dart_importer_spark.query.engine import InvertedIndex

ROWS = [
    # (conv_id, turn_idx, text, ts, nc) — doc_id = rank of (conv_id, turn_idx)
    ("c1", 0, "a b c d e", datetime(2024, 1, 1, 5), 100),   # doc 0
    ("c1", 1, "a x x b",   datetime(2024, 1, 2, 5), 150),   # doc 1
    ("c2", 0, "b a",       datetime(2024, 1, 2, 6), 200),   # doc 2
    ("c2", 1, "a x x x x x b", datetime(2024, 1, 3, 1), 250),  # doc 3
    ("c3", 0, "a",         datetime(2024, 1, 3, 2), 300),   # doc 4
    ("c3", 1, "b c a",     datetime(2024, 1, 3, 3), 350),   # doc 5
    ("c4", 0, "a q a",     datetime(2024, 1, 3, 4), 400),   # doc 6
    ("c4", 1, "q w",       datetime(2024, 1, 4, 1), 450),   # doc 7
]


@pytest.fixture(scope="module")
def span_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string, ts timestamp, nc long"
    )
    out = str(tmp_path_factory.mktemp("spans") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        meta_cols=("ts", "nc", "text"),
    )
    return InvertedIndex(spark, out)


def _near(ix, clauses, slop, in_order):
    return [
        r["doc_id"]
        for r in ix.span_near(clauses, slop=slop, in_order=in_order, k=100).collect()
    ]


def brute_span_near(tokens: list[str], clauses: list[str], slop: int,
                    in_order: bool) -> bool:
    """Reference evaluator: try every choice of one position per clause."""
    pos_lists = [
        [i for i, t in enumerate(tokens) if t == c] for c in clauses
    ]
    if any(not pl for pl in pos_lists):
        return False
    n = len(clauses)
    for combo in itertools.product(*pos_lists):
        if len(set(combo)) != n:
            continue
        if in_order and any(combo[i] >= combo[i + 1] for i in range(n - 1)):
            continue
        if (max(combo) - min(combo) + 1) - n <= slop:
            return True
    return False


def test_span_near_ordered(span_index):
    assert _near(span_index, ["a", "b"], 0, True) == [0]
    assert _near(span_index, ["a", "b"], 2, True) == [0, 1]
    assert _near(span_index, ["a", "b"], 5, True) == [0, 1, 3]
    assert _near(span_index, ["a", "b", "c"], 1, True) == [0]


def test_span_near_unordered(span_index):
    assert _near(span_index, ["a", "b"], 0, False) == [0, 2]
    assert _near(span_index, ["a", "b"], 2, False) == [0, 1, 2, 5]
    assert _near(span_index, ["a", "b", "c"], 0, False) == [0, 5]


def test_span_near_duplicate_clause(span_index):
    # ["a","a"] needs two DISTINCT occurrences: doc 6 ("a q a") only
    assert _near(span_index, ["a", "a"], 1, False) == [6]
    assert _near(span_index, ["a", "a"], 1, True) == [6]
    assert _near(span_index, ["a", "a"], 0, True) == []  # gap of 1 > slop 0


def test_span_near_absent_term(span_index):
    assert _near(span_index, ["a", "zz"], 9, True) == []


def test_span_near_matches_bruteforce_randomized(span_index, spark,
                                                 tmp_path_factory):
    rng = random.Random(41)
    vocab = ["a", "b", "c", "d"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [("r", i, t) for i, t in enumerate(docs)],
        "conv_id string, turn_idx int, text string",
    )
    out = str(tmp_path_factory.mktemp("spans_rand") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        meta_cols=(),
    )
    ix = InvertedIndex(spark, out)
    cases = [
        (["a", "b"], 0, True), (["a", "b"], 2, False),
        (["a", "b", "c"], 1, True), (["a", "b", "c"], 2, False),
        (["a", "a"], 3, True), (["c", "d"], 1, False),
    ]
    for clauses, slop, in_order in cases:
        got = _near(ix, clauses, slop, in_order)
        want = [
            i for i, t in enumerate(docs)
            if brute_span_near(t.split(), clauses, slop, in_order)
        ]
        assert got == want, (clauses, slop, in_order)


def test_span_first(span_index):
    # 0-based position < end
    assert [r["doc_id"] for r in span_index.span_first("a", 1, k=100).collect()] \
        == [0, 1, 3, 4, 6]
    assert [r["doc_id"] for r in span_index.span_first("a", 3, k=100).collect()] \
        == [0, 1, 2, 3, 4, 5, 6]
    with pytest.raises(ValueError, match="exactly one term"):
        span_index.span_first("a b", 3)


def test_span_not(span_index):
    # doc 0 "a b c d e": c@2 is within +-1 of d@3 -> killed; doc 5 "b c a"
    # has c but no d -> survives
    got = [r["doc_id"] for r in
           span_index.span_not("c", "d", pre=1, post=1, k=100).collect()]
    assert got == [5]
    # b@1 is NOT within +-1 of d@3 -> doc 0 survives
    got = [r["doc_id"] for r in
           span_index.span_not("b", "d", pre=1, post=1, k=100).collect()]
    assert 0 in got
    # pre/post = 0: unit spans of different terms never overlap
    got = [r["doc_id"] for r in span_index.span_not("c", "d", k=100).collect()]
    assert got == [0, 5]


def test_span_or(span_index):
    # term legs: c -> {0,5}, q -> {6,7}
    got = [r["doc_id"] for r in span_index.span_or(["c", "q"], k=100).collect()]
    assert got == [0, 5, 6, 7]
    # phrase leg ("b c" exact span) unioned with a term leg
    got = [r["doc_id"] for r in span_index.span_or(["b c", "w"], k=100).collect()]
    assert got == [0, 5, 7]
    # absent clause contributes nothing; all-absent -> empty
    assert [r["doc_id"] for r in span_index.span_or(["c", "zz"], k=100).collect()] \
        == [0, 5]
    assert span_index.span_or(["zz"], k=100).count() == 0
    with pytest.raises(ValueError, match="at least one"):
        span_index.span_or([])


def test_span_containing_within(span_index):
    # big = ordered (a, b) windows, little = x inside the window bounds
    # slop 5 (width 6): windows doc0 [0,1], doc1 [0,3], doc3 [0,6];
    # x lies inside only in docs 1 and 3
    got = [r["doc_id"] for r in span_index.span_containing(
        ["a", "b"], "x", slop=5, in_order=True, k=100).collect()]
    assert got == [1, 3]
    # slop 2 (width 3): doc3's window no longer forms -> only doc 1
    got = [r["doc_id"] for r in span_index.span_containing(
        ["a", "b"], "x", slop=2, in_order=True, k=100).collect()]
    assert got == [1]
    # span_within emits the same doc set with roles swapped
    got = [r["doc_id"] for r in span_index.span_within(
        "x", ["a", "b"], slop=5, in_order=True, k=100).collect()]
    assert got == [1, 3]
    # absent little / absent big term -> empty
    assert span_index.span_containing(["a", "b"], "zz", slop=5, k=100).count() == 0
    assert span_index.span_containing(["a", "zz"], "x", slop=5, k=100).count() == 0
    with pytest.raises(ValueError, match="exactly one"):
        span_index.span_containing(["a b"], "x")
    with pytest.raises(ValueError, match="exactly one"):
        span_index.span_containing(["a"], "b c")


def brute_span_containing(tokens: list[str], big: list[str], little: str,
                          slop: int, in_order: bool) -> bool:
    pos_lists = [[i for i, t in enumerate(tokens) if t == c] for c in big]
    lp = [i for i, t in enumerate(tokens) if t == little]
    if any(not pl for pl in pos_lists) or not lp:
        return False
    n = len(big)
    for combo in itertools.product(*pos_lists):
        if len(set(combo)) != n:
            continue
        if in_order and any(combo[i] >= combo[i + 1] for i in range(n - 1)):
            continue
        if (max(combo) - min(combo) + 1) - n > slop:
            continue
        if any(min(combo) <= p <= max(combo) for p in lp):
            return True
    return False


def test_span_containing_matches_bruteforce(spark, tmp_path_factory):
    rng = random.Random(43)
    vocab = ["a", "b", "c", "d"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [("r", i, t) for i, t in enumerate(docs)],
        "conv_id string, turn_idx int, text string",
    )
    out = str(tmp_path_factory.mktemp("spans_cont") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        meta_cols=(),
    )
    ix = InvertedIndex(spark, out)
    cases = [
        (["a", "b"], "c", 2, True), (["a", "b"], "c", 4, False),
        (["a", "c"], "d", 3, True), (["b", "d"], "a", 2, False),
    ]
    for big, little, slop, in_order in cases:
        got = [r["doc_id"] for r in ix.span_containing(
            big, little, slop=slop, in_order=in_order, k=100).collect()]
        want = [i for i, t in enumerate(docs)
                if brute_span_containing(t.split(), big, little, slop, in_order)]
        assert got == want, (big, little, slop, in_order)


def test_termvectors(span_index, spark, tmp_path_factory):
    rows = span_index.termvectors("c4", 0).collect()  # "a q a"
    assert [(r["term"], r["tf"]) for r in rows] == [("a", 2), ("q", 1)]
    # partial key must raise, not silently merge several docs' vectors
    with pytest.raises(ValueError, match="full key"):
        span_index.termvectors("c4")
    # shingle subfields rejected (the vector comes from the stored base text)
    df = spark.createDataFrame(
        [("s", 0, "a b")], "conv_id string, turn_idx int, text string"
    )
    out = str(tmp_path_factory.mktemp("tv_sh") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=1, n_buckets=2),
        shingle_fields=(("text", 2),), meta_cols=("text",),
    )
    with pytest.raises(ValueError, match="shingle"):
        InvertedIndex(spark, out).termvectors("s", 0, field="text._2gram")


def test_mtermvectors(span_index):
    rows = span_index.mtermvectors([("c4", 0), ("c2", 0)]).collect()
    got = [
        ((r["conv_id"], r["turn_idx"]), r["term"], r["tf"]) for r in rows
    ]
    # key-ordered, term-ascending within each doc: "b a" then "a q a"
    assert got == [
        (("c2", 0), "a", 1), (("c2", 0), "b", 1),
        (("c4", 0), "a", 2), (("c4", 0), "q", 1),
    ]
    assert span_index.mtermvectors([]).count() == 0


def test_histogram_filled(span_index):
    # "c" matches docs 0 (nc=100) and 5 (nc=350): bucket 200 must be zero
    rows = span_index.histogram_filled("c", "nc", 100).collect()
    assert [(r["bucket"], r["doc_count"]) for r in rows] == [
        (100, 1), (200, 0), (300, 1),
    ]
    rows = span_index.histogram_filled("c", "nc", 100, bounds=(0, 400)).collect()
    assert [(r["bucket"], r["doc_count"]) for r in rows] == [
        (0, 0), (100, 1), (200, 0), (300, 1), (400, 0),
    ]
    with pytest.raises(ValueError, match="positive integer"):
        span_index.histogram_filled("c", "nc", 0.5)
    # negative FRACTIONAL bound floors to the bucket below, not toward 0
    rows = span_index.histogram_filled(
        "c", "nc", 100, bounds=(-0.5, 100)
    ).collect()
    assert rows[0]["bucket"] == -100 and rows[0]["doc_count"] == 0


def test_date_histogram_filled_quarter(span_index):
    # 'quarter' is whitelisted but Spark's interval parser has no quarter
    # unit — the axis step must map to 3 months
    rows = span_index.date_histogram_filled("a", "ts", "quarter").collect()
    assert [(r["bucket"][:10], r["doc_count"]) for r in rows] == [
        ("2024-01-01", 7)
    ]
    rows = span_index.date_histogram_filled(
        "a", "ts", "quarter", bounds=("2023-07-01 00:00:00", "2024-01-01 00:00:00")
    ).collect()
    assert [(r["bucket"][:10], r["doc_count"]) for r in rows] == [
        ("2023-07-01", 0), ("2023-10-01", 0), ("2024-01-01", 7),
    ]


def test_pipeline_aggs(span_index):
    # every doc contains "a" except doc 7 -> day counts [1, 2, 4]
    rows = span_index.date_histogram_pipeline("a", "ts", "day", window=3).collect()
    assert [r["doc_count"] for r in rows] == [1, 2, 4]
    assert [r["cum_count"] for r in rows] == [1, 3, 7]
    assert [r["derivative"] for r in rows] == [None, 1.0, 2.0]
    assert [r["moving_avg"] for r in rows] == [1.0, 1.5, round(7 / 3, 6)]


def test_bucket_sort(span_index):
    # terms-agg on nc buckets is overkill here; sort date buckets by count
    rows = span_index.bucket_sort(
        "a", "ts", interval="day", ascending=True, size=2
    ).collect()
    assert [r["doc_count"] for r in rows] == [1, 2]
    top = span_index.bucket_sort("a", "ts", interval="day", size=1).collect()
    assert top[0]["doc_count"] == 4


def test_date_histogram_filled_gap(span_index):
    # "c" matches doc 0 (Jan 1) and doc 5 (Jan 3) — Jan 2 must appear as 0
    rows = span_index.date_histogram_filled("c", "ts", "day").collect()
    assert [(r["bucket"][:10], r["doc_count"]) for r in rows] == [
        ("2024-01-01", 1), ("2024-01-02", 0), ("2024-01-03", 1),
    ]


def test_date_histogram_filled_bounds(span_index):
    # extended_bounds EXTENDS the axis (zero buckets) but never clips data
    rows = span_index.date_histogram_filled(
        "c", "ts", "day", bounds=("2023-12-31 00:00:00", "2024-01-02 00:00:00")
    ).collect()
    assert [(r["bucket"][:10], r["doc_count"]) for r in rows] == [
        ("2023-12-31", 0), ("2024-01-01", 1), ("2024-01-02", 0),
        ("2024-01-03", 1),
    ]
    # no matches at all + bounds -> pure zero axis
    rows = span_index.date_histogram_filled(
        "zz", "ts", "day", bounds=("2024-02-01 00:00:00", "2024-02-03 00:00:00")
    ).collect()
    assert [r["doc_count"] for r in rows] == [0, 0, 0]
    with pytest.raises(ValueError, match="unsupported interval"):
        span_index.date_histogram_filled("c", "ts", "minute")


def test_bucket_stats_pipeline(span_index):
    row = span_index.bucket_stats_pipeline("a", "ts", "day").collect()[0]
    assert row["avg_bucket"] == round(7 / 3, 6)
    assert (row["min_bucket"], row["max_bucket"]) == (1, 4)
    assert (row["sum_bucket"], row["n_buckets"]) == (7, 3)


def test_sort_by_field(span_index):
    rows = span_index.sort_by("a", "nc", k=3, ascending=True).collect()
    assert [(r["doc_id"], r["nc"]) for r in rows] == [
        (0, 100), (1, 150), (2, 200),
    ]
    rows = span_index.sort_by("a", "nc", k=2, ascending=False).collect()
    assert [r["doc_id"] for r in rows] == [6, 5]


def test_decay_score_math(span_index):
    # at |x - origin| == scale the multiplier must equal `decay` exactly
    base = {
        r["doc_id"]: r["score"]
        for r in span_index.topk("a", k=100, round_scores=None).collect()
    }
    decayed = {
        r["doc_id"]: r["score"]
        for r in span_index.decay_score(
            "a", k=100, on="nc", origin=100.0, scale=100.0, decay=0.5
        ).collect()
    }
    assert set(decayed) == set(base)
    # doc 0: nc=100 = origin -> multiplier 1.0; doc 2: nc=200 -> exactly decay
    assert decayed[0] == pytest.approx(base[0], rel=1e-12)
    assert decayed[2] == pytest.approx(base[2] * 0.5, rel=1e-12)
    # monotone: farther from origin never increases the multiplier
    for fn in ("gauss", "exp", "linear"):
        out = {
            r["doc_id"]: r["score"]
            for r in span_index.decay_score(
                "a", k=100, on="nc", origin=100.0, scale=150.0,
                decay=0.5, fn=fn,
            ).collect()
        }
        mults = {d: out[d] / base[d] for d in out if base[d] > 0}
        # nc grows with doc_id in ROWS -> multiplier non-increasing
        seq = [mults[d] for d in sorted(mults)]
        assert all(x >= y - 1e-12 for x, y in zip(seq, seq[1:]))


def test_decay_score_validation(span_index):
    with pytest.raises(ValueError, match="decay must be"):
        span_index.decay_score("a", decay=1.0)
    with pytest.raises(ValueError, match="scale must be"):
        span_index.decay_score("a", scale=0.0)
    # bogus fn must raise even when the query matches nothing (validation
    # runs before the empty-match early return)
    with pytest.raises(ValueError, match="unknown fn"):
        span_index.decay_score("zz_not_a_term", fn="cosine")


def test_match_bool_prefix(span_index):
    # "c a" -> bool should [term c, prefix a*]; prefix hits add constant 1.0
    out = {
        r["doc_id"]: r["score"]
        for r in span_index.match_bool_prefix("c a", k=100).collect()
    }
    bm_c = {
        r["doc_id"]: r["score"]
        for r in span_index.topk("c", k=100, round_scores=None).collect()
    }
    # docs with only the prefix term (no "c"): exactly 1.0
    for d in (1, 2, 3, 4, 6):
        assert out[d] == pytest.approx(1.0)
    # docs with both: BM25(c) + 1.0
    for d in (0, 5):
        assert out[d] == pytest.approx(bm_c[d] + 1.0, rel=1e-12)
    # doc 7 ("q w") matches neither clause
    assert 7 not in out


def test_match_bool_prefix_single_token(span_index):
    # one-token query degenerates to a pure prefix (constant 1.0)
    out = span_index.match_bool_prefix("q", k=100).collect()
    assert {r["doc_id"] for r in out} == {6, 7}
    assert all(r["score"] == pytest.approx(1.0) for r in out)


def test_multi_index_topk(spark, tmp_path_factory):
    """Cross-index merge == ES query_then_fetch: per-index local stats,
    union of per-index top-k, re-ranked (score desc, index asc, doc_id)."""
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex, multi_index_topk

    base = tmp_path_factory.mktemp("multi")
    corpora = {
        "a": [("x", 0, "apple banana"), ("x", 1, "apple apple cherry")],
        "b": [("y", 0, "apple date"), ("y", 1, "elderberry fig")],
    }
    idxs = {}
    for name, rows in corpora.items():
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        out = str(base / name)
        build_index(spark, df, out, BuildConfig(n_segments=1, n_buckets=2),
                    meta_cols=())
        idxs[name] = InvertedIndex(spark, out)

    got = multi_index_topk(idxs, "apple", k=10, round_scores=6).collect()
    # every per-index hit present, labeled, globally sorted
    assert {(r["index"], r["doc_id"]) for r in got} == {
        ("a", 0), ("a", 1), ("b", 0)
    }
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    # per-index scores must equal that index's own topk (LOCAL stats)
    for name, ix in idxs.items():
        own = {r["doc_id"]: r["score"]
               for r in ix.topk("apple", k=10, round_scores=6).collect()}
        for r in got:
            if r["index"] == name:
                assert r["score"] == own[r["doc_id"]]
    # k truncates globally
    assert len(multi_index_topk(idxs, "apple", k=2).collect()) == 2
    with pytest.raises(ValueError, match="at least one"):
        multi_index_topk({}, "apple")

    # indices_boost: b's scores tripled BEFORE rounding; a's unchanged
    boosted = multi_index_topk(
        idxs, "apple", k=10, round_scores=6, indices_boost={"b": 3.0}
    ).collect()
    raw = {}
    for name, ix in idxs.items():
        for r in ix.topk("apple", k=10).collect():
            raw[(name, r["doc_id"])] = r["score"]
    for r in boosted:
        mult = 3.0 if r["index"] == "b" else 1.0
        assert r["score"] == pytest.approx(
            round(raw[(r["index"], r["doc_id"])] * mult, 6), abs=1e-12
        )
    bs = [r["score"] for r in boosted]
    assert bs == sorted(bs, reverse=True)
    with pytest.raises(ValueError, match="unknown index"):
        multi_index_topk(idxs, "apple", indices_boost={"zz": 2.0})
    with pytest.raises(ValueError, match="boost must be > 0"):
        multi_index_topk(idxs, "apple", indices_boost={"a": 0.0})


def test_match_phrase_scored(spark, tmp_path_factory):
    """Lucene PhraseQuery BM25: tf = phrase occurrences (overlaps count),
    idf = sum of term idfs — values checked against the closed formula."""
    import math

    rows = [("p", 0, "x y"), ("p", 1, "x y z x y"),
            ("p", 2, "b b b"), ("p", 3, "y x")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("pscore") / "idx")
    build_index(spark, df, out,
                BuildConfig(n_segments=1, n_buckets=2, store_positions=True),
                meta_cols=())
    ix = InvertedIndex(spark, out)

    def idf(n, dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

    def expect(isum, tf, dl, avgdl):
        return isum * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    avgdl = (2 + 5 + 3 + 2) / 4.0
    got = {r["doc_id"]: r["score"]
           for r in ix.match_phrase_scored("x y", k=10).collect()}
    isum = idf(4, 3) + idf(4, 3)  # x in docs 0,1,3; y in docs 0,1,3
    assert set(got) == {0, 1}
    assert got[0] == pytest.approx(expect(isum, 1, 2, avgdl), rel=1e-9)
    assert got[1] == pytest.approx(expect(isum, 2, 5, avgdl), rel=1e-9)

    # overlapping matches: "b b" in "b b b" -> tf 2; idf counts BOTH b's
    got = {r["doc_id"]: r["score"]
           for r in ix.match_phrase_scored("b b", k=10).collect()}
    isum = 2 * idf(4, 1)
    assert got == {2: pytest.approx(expect(isum, 2, 3, avgdl), rel=1e-9)}

    # filter-context variant unchanged: constant score
    fc = ix.match_phrase("x y", k=10).collect()
    assert all(r["score"] == 1.0 for r in fc)

    # non-primary field: dl decoded from the field's posting runs (the
    # doc_stats dl is the primary field's) — one doc, tf 1, dl 2 = avgdl
    rows2 = [("p", 0, "x y", "u v")]
    df2 = spark.createDataFrame(
        rows2, "conv_id string, turn_idx int, text string, other string"
    )
    out2 = str(tmp_path_factory.mktemp("pscore2") / "idx")
    build_index(
        spark, df2, out2,
        BuildConfig(n_segments=1, n_buckets=2, store_positions=True),
        text_cols=("text", "other"), meta_cols=(),
    )
    got2 = {r["doc_id"]: r["score"]
            for r in InvertedIndex(spark, out2)
            .match_phrase_scored("u v", field="other").collect()}
    isum2 = idf(1, 1) + idf(1, 1)
    assert got2 == {0: pytest.approx(expect(isum2, 1, 2, 2.0), rel=1e-9)}


def test_match_phrase_scored_sloppy(spark, tmp_path_factory):
    """Anchored-window sloppy scoring: anchors weighted 1/(1+cost),
    cost = sum of minimal per-slot displacements; slop=0 and slop>0
    agree exactly on docs whose matches are all exact."""
    import math

    rows = [("p", 0, "x y"), ("p", 1, "x y z x y"),
            ("p", 2, "b b b"), ("p", 3, "y x")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("psloppy") / "idx")
    build_index(spark, df, out,
                BuildConfig(n_segments=1, n_buckets=2, store_positions=True),
                meta_cols=())
    ix = InvertedIndex(spark, out)

    def idf(n, dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

    def expect(isum, tf, dl, avgdl):
        return isum * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    avgdl = (2 + 5 + 3 + 2) / 4.0
    isum = 2 * idf(4, 3)
    got0 = {r["doc_id"]: r["score"]
            for r in ix.match_phrase_scored("x y", k=10).collect()}
    got1 = {r["doc_id"]: r["score"]
            for r in ix.match_phrase_scored("x y", k=10, slop=1).collect()}
    # slop 1 admits no extra doc here and every match is exact -> identical
    assert got1 == {k: pytest.approx(v, rel=1e-9) for k, v in got0.items()}

    # slop 2 admits the transposed "y x": anchor x@1, y@0, cost 2, w=1/3
    got2 = {r["doc_id"]: r["score"]
            for r in ix.match_phrase_scored("x y", k=10, slop=2).collect()}
    assert set(got2) == {0, 1, 3}
    assert got2[0] == pytest.approx(expect(isum, 1.0, 2, avgdl), rel=1e-9)
    assert got2[1] == pytest.approx(expect(isum, 2.0, 5, avgdl), rel=1e-9)
    assert got2[3] == pytest.approx(
        expect(isum, 1.0 / 3.0, 2, avgdl), rel=1e-9
    )

    # DSL query-context parity at slop>0
    from dart_importer_spark.query import dsl as _dsl

    via_dsl = {r["doc_id"]: r["score"]
               for r in _dsl.search(ix, {"query": {"match_phrase": {
                   "text": {"query": "x y", "slop": 2}}}, "size": 10}
               ).collect()}
    assert via_dsl == {k: pytest.approx(v, rel=1e-9) for k, v in got2.items()}


def test_suggest_phrase(spark, tmp_path_factory):
    """Phrase suggester: per-token Damerau candidates -> whole-phrase
    rewrites under score = sum(ln(1+df)) - penalty*sum(dist); collation
    keeps only rewrites with exact-phrase hits."""
    import math

    rows = [("s", 0, "apple pie"), ("s", 1, "apple tart"),
            ("s", 2, "maple pie")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("didyoumean") / "idx")
    build_index(spark, df, out,
                BuildConfig(n_segments=1, n_buckets=2, store_positions=True),
                meta_cols=())
    ix = InvertedIndex(spark, out)

    got = ix.suggest_phrase("aple pie", k=5).collect()
    by_sug = {r["suggestion"]: (r["score"], r["n_edits"]) for r in got}
    # apple: df 2 dist 1; maple: df 1 dist 1; pie: df 2 dist 0
    assert by_sug["apple pie"] == (
        round(math.log1p(2) + math.log1p(2) - 1.0, 6), 1)
    assert by_sug["maple pie"] == (
        round(math.log1p(1) + math.log1p(2) - 1.0, 6), 1)
    assert got[0]["suggestion"] == "apple pie"  # higher df wins at equal edits

    # collation: "maple tart" never occurs as a phrase -> dropped
    col = [r["suggestion"]
           for r in ix.suggest_phrase("aple tart", k=5, collate=True).collect()]
    assert "apple tart" in col and "maple tart" not in col

    # un-indexed token kept verbatim at df 0
    got = ix.suggest_phrase("zzz pie", k=2).collect()
    assert got[0]["suggestion"] == "zzz pie"
    assert got[0]["score"] == round(math.log1p(2), 6)
    assert got[0]["n_edits"] == 0


def test_metric_aggs(span_index):
    """weighted_avg / value_count / boxplot / MAD / top_metrics /
    matrix_stats over the match set of "a" (docs 0-6; nc 100..400,
    dl 5,4,2,7,1,3,3) — every value hand-computed."""
    nc = [100, 150, 200, 250, 300, 350, 400]
    dl = [5, 4, 2, 7, 1, 3, 3]

    (wa,) = span_index.weighted_avg("a", "nc", "dl").collect()
    assert wa["value"] == round(
        sum(x * w for x, w in zip(nc, dl)) / sum(dl), 6)  # 232.0

    (vc,) = span_index.value_count("a", "nc").collect()
    assert vc["value"] == 7

    (bp,) = span_index.boxplot("a", "nc").collect()
    assert (bp["min"], bp["q1"], bp["q2"], bp["q3"], bp["max"]) == (
        100.0, 175.0, 250.0, 325.0, 400.0)

    (mad,) = span_index.median_absolute_deviation("a", "nc").collect()
    assert mad["value"] == 100.0

    (tm,) = span_index.top_metrics("a", "nc", "doc_id").collect()
    assert (tm["metric"], tm["sort"]) == (400, 6)
    (tm,) = span_index.top_metrics("a", "nc", "doc_id", ascending=True).collect()
    assert (tm["metric"], tm["sort"]) == (100, 0)

    (ms,) = span_index.matrix_stats("a", "nc", "dl").collect()
    n = len(nc)
    xm, ym = sum(nc) / n, sum(dl) / n
    cov = sum((x - xm) * (y - ym) for x, y in zip(nc, dl)) / (n - 1)
    var_x = sum((x - xm) ** 2 for x in nc) / (n - 1)
    var_y = sum((y - ym) ** 2 for y in dl) / (n - 1)
    assert ms["covariance"] == round(cov, 6)
    assert ms["correlation"] == round(cov / (var_x ** 0.5 * var_y ** 0.5), 6)
    assert ms["doc_count"] == 7

    # paired t_test: per-doc differences nc - dl, df = n - 1
    import statistics

    d = [x - y for x, y in zip(nc, dl)]
    t_want = statistics.fmean(d) / (statistics.variance(d) / len(d)) ** 0.5
    (tt,) = span_index.t_test(
        "a", on="nc", on_b="dl", test_type="paired"
    ).collect()
    assert tt["t_stat"] == round(t_want, 6)
    assert tt["deg_f"] == float(len(d) - 1)
    assert (tt["n_a"], tt["n_b"]) == (7, 7)
    # ES paired body form: two different fields, no per-side filters
    from dart_importer_spark.query.dsl import aggs

    (dtt,) = aggs(span_index, {
        "query": {"match": {"text": "a"}},
        "aggs": {"tt": {"t_test": {
            "a": {"field": "nc"}, "b": {"field": "dl"}, "type": "paired",
        }}},
    })["tt"].collect()
    assert dtt == tt


def test_scored_phrase_requires_positions(built_index):
    with pytest.raises(ValueError, match="store_positions"):
        built_index.match_phrase_scored("the and")


def test_auto_date_histogram(span_index):
    # span Jan1 05:00 .. Jan3 04:00 -> 48 dense hours, 3 dense days.
    # target 48: hour axis fits exactly -> hour grain, zero-filled
    rows = span_index.auto_date_histogram("a", "ts", target_buckets=48).collect()
    assert all(r["interval"] == "hour" for r in rows)
    assert len(rows) == 48 and sum(r["doc_count"] for r in rows) == 7
    # target 10: hour(48) > 10, day(3) <= 10 -> day
    rows = span_index.auto_date_histogram("a", "ts", target_buckets=10).collect()
    assert all(r["interval"] == "day" for r in rows)
    assert [r["doc_count"] for r in rows] == [1, 2, 4]
    # target 2: day(3) > 2, week(1) <= 2 -> week
    rows = span_index.auto_date_histogram("a", "ts", target_buckets=2).collect()
    assert [(r["interval"], r["doc_count"]) for r in rows] == [("week", 7)]
    # empty match set -> empty frame, stable schema
    assert span_index.auto_date_histogram("zz", "ts").count() == 0


def test_auto_date_histogram_sparse_span(spark, tmp_path_factory):
    # 2 docs YEARS apart: only 2 non-empty buckets at any grain, but the
    # span must drive the pick -> year grain with the gap year zero-filled
    from datetime import datetime as dt
    rows = [("s", 0, "x", dt(2020, 3, 1)), ("s", 1, "x", dt(2022, 5, 1))]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    )
    out = str(tmp_path_factory.mktemp("sparse_dh") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=1, n_buckets=2),
                meta_cols=("ts",))
    ix = InvertedIndex(spark, out)
    # target 10: the 10-quarter span fits exactly -> quarter grain
    rows = ix.auto_date_histogram("x", "ts", target_buckets=10).collect()
    assert all(r["interval"] == "quarter" for r in rows) and len(rows) == 10
    # target 5: quarters(10) > 5 -> year grain, gap year zero-filled
    rows = ix.auto_date_histogram("x", "ts", target_buckets=5).collect()
    assert [(r["bucket"][:4], r["doc_count"], r["interval"]) for r in rows] \
        == [("2020", 1, "year"), ("2021", 0, "year"), ("2022", 1, "year")]


def test_serial_diff(span_index):
    rows = span_index.serial_diff("a", "ts", "day", lag=2).collect()
    assert [r["diff"] for r in rows] == [None, None, 3.0]  # 4 - 1
    # CALENDAR lag over a gappy axis: "c" matches Jan 1 and Jan 3 only;
    # the dense axis [1, 0, 1] must lag through the zero bucket
    rows = span_index.serial_diff("c", "ts", "day", lag=2).collect()
    assert [(r["doc_count"], r["diff"]) for r in rows] == [
        (1, None), (0, None), (1, 0.0)]
    with pytest.raises(ValueError, match="lag must be"):
        span_index.serial_diff("a", "ts", lag=0)


def test_rare_terms(span_index):
    # nc values are unique per doc -> every matched value is "rare"
    rows = span_index.rare_terms("a", "nc", max_doc_count=1).collect()
    assert [r["nc"] for r in rows] == [100, 150, 200, 250, 300, 350, 400]
    assert all(r["doc_count"] == 1 for r in rows)
    # doc_count floor: nothing has <= 0
    assert span_index.rare_terms("a", "nc", max_doc_count=0).count() == 0


def test_adjacency_matrix(span_index):
    # a: docs 0-6; b: docs 0,1,2,3,5; c: docs 0,5
    out = {r["name"]: r["doc_count"]
           for r in span_index.adjacency_matrix(
               {"A": ["a"], "B": ["b"], "C": ["c"]}).collect()}
    assert out == {"A": 7, "B": 5, "C": 2,
                   "A&B": 5, "A&C": 2, "B&C": 2}
    with pytest.raises(ValueError, match="may not contain"):
        span_index.adjacency_matrix({"A&B": ["a"]})
    with pytest.raises(ValueError, match="at least one"):
        span_index.adjacency_matrix({})


def test_hybrid_rrf(spark, tmp_path_factory):
    """RRF fusion: per-leg local ranks (BM25 / cosine), score =
    sum 1/(60+rank); single-leg docs still score — hand-checked."""
    rows = [("h", 0, "x y"), ("h", 1, "x"), ("h", 2, "z")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("rrf") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=1, n_buckets=2),
                meta_cols=())
    ix = InvertedIndex(spark, out)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.6, 0.8])],
        "vec_id long, embedding array<float>",
    )
    got = {r["doc_id"]: r["score"]
           for r in ix.hybrid_rrf("x", [1.0, 0.0], emb, k=10).collect()}
    # lexical: doc1 (dl=1) rank1, doc0 (dl=2) rank2; doc2 unmatched
    # vector:  v0 cos=1.0 rank1, v2 cos=0.6 rank2, v1 cos=0.0 rank3
    assert got == {
        0: round(1 / 62 + 1 / 61, 6),
        1: round(1 / 61 + 1 / 63, 6),
        2: round(0 + 1 / 62, 6),
    }
    assert len(ix.hybrid_rrf("x", [1.0, 0.0], emb, k=2).collect()) == 2

    # deleting the top vector neighbour must NOT leave a ghost rank:
    # doc 0 gone -> v2 is vector rank 1, doc1 lexical rank 1 + vector rank 3
    ix.delete_by_query(F.col("doc_id") == 0)
    got = {r["doc_id"]: r["score"]
           for r in ix.hybrid_rrf("x", [1.0, 0.0], emb, k=10).collect()}
    assert got == {
        1: round(1 / 61 + 1 / 62, 6),   # lexical rank 1, vector rank 2 now
        2: round(0 + 1 / 61, 6),        # vector rank 1 now
    }


# ---------------------------------------------------------------- intervals
IV_ROWS = [
    ("i1", 0, "a b c d e", datetime(2024, 2, 1), 10),      # doc 0
    ("i1", 1, "a x x b", datetime(2024, 2, 2), 20),        # doc 1
    ("i2", 0, "b a", datetime(2024, 2, 3), 30),            # doc 2
    ("i2", 1, "a x x x x x b", datetime(2024, 2, 4), 40),  # doc 3
    ("i3", 0, "alpha beta q", datetime(2024, 2, 5), 50),   # doc 4
    ("i3", 1, "b c a q w", datetime(2024, 2, 6), 60),      # doc 5
]


@pytest.fixture(scope="module")
def iv_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        IV_ROWS, "conv_id string, turn_idx int, text string, ts timestamp, nc long"
    )
    out = str(tmp_path_factory.mktemp("intervals") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        meta_cols=("ts", "nc"),
    )
    return InvertedIndex(spark, out)


def _iv(ix, src):
    return [r["doc_id"] for r in ix.intervals_query(src, k=100).collect()]


def test_intervals_match(iv_index):
    m = {"match": {"query": "a b", "max_gaps": 0, "ordered": True}}
    assert _iv(iv_index, m) == [0]
    m = {"match": {"query": "a b", "max_gaps": 2, "ordered": True}}
    assert _iv(iv_index, m) == [0, 1]
    m = {"match": {"query": "a b", "max_gaps": 0, "ordered": False}}
    assert _iv(iv_index, m) == [0, 2]
    # single-term match needs no max_gaps
    assert _iv(iv_index, {"match": {"query": "q"}}) == [4, 5]
    # multi-term without max_gaps is rejected, not silently unbounded
    with pytest.raises(ValueError):
        _iv(iv_index, {"match": {"query": "a b"}})
    # unknown term -> empty, not an error
    assert _iv(iv_index, {"match": {"query": "zzz"}}) == []


def test_intervals_any_of_and_leaves(iv_index):
    src = {"any_of": {"intervals": [
        {"match": {"query": "e"}}, {"match": {"query": "q"}},
    ]}}
    assert _iv(iv_index, src) == [0, 4, 5]
    assert _iv(iv_index, {"prefix": "alp"}) == [4]
    assert _iv(iv_index, {"wildcard": "?eta"}) == [4]
    assert _iv(iv_index, {"fuzzy": {"term": "betA", "fuzziness": 1}}) == [4]


def test_intervals_all_of(iv_index):
    def allof(max_gaps, ordered, kids):
        return {"all_of": {
            "ordered": ordered, "max_gaps": max_gaps,
            "intervals": [{"match": {"query": t}} for t in kids],
        }}
    # a then b, combined window gaps <= 1: doc 0 (adjacent); doc 1 has 2 gaps
    assert _iv(iv_index, allof(1, True, ["a", "b"])) == [0]
    assert _iv(iv_index, allof(2, True, ["a", "b"])) == [0, 1]
    # unordered: doc 2 ("b a") joins at gaps=0
    assert _iv(iv_index, allof(0, False, ["a", "b"])) == [0, 2]
    # unlimited gaps (-1): pure ordered co-occurrence
    assert _iv(iv_index, allof(-1, True, ["a", "b"])) == [0, 1, 3]
    # nested composition: (a b adjacent) then c
    nested = {"all_of": {"ordered": True, "max_gaps": 0, "intervals": [
        {"match": {"query": "a b", "max_gaps": 0, "ordered": True}},
        {"match": {"query": "c"}},
    ]}}
    assert _iv(iv_index, nested) == [0]


def test_multi_index_dfs_equals_merged_corpus(spark, tmp_path_factory):
    """dfs_query_then_fetch: the DFS phase merges per-index term stats
    into GLOBAL df/N/avgdl, every index scores with them, so the merged
    top-k is exactly the top-k of ONE index over the union corpus —
    rank and score identity, the property the DFS phase exists for
    (local-stats query_then_fetch does not have it)."""
    from dart_importer_spark.datagen import generate_transcripts
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import (
        InvertedIndex,
        multi_index_topk,
    )

    base = tmp_path_factory.mktemp("dfs")
    tx = generate_transcripts(spark, 40).persist()
    cfg = BuildConfig(n_segments=2, n_buckets=4)
    idxs = {}
    for name, par in (("h0", 0), ("h1", 1)):
        out = str(base / name)
        build_index(
            spark, tx.filter(F.crc32(F.col("conv_id")) % 2 == par),
            out, cfg, meta_cols=("role",),
        )
        idxs[name] = InvertedIndex(spark, out)
    full_dir = str(base / "full")
    build_index(spark, tx, full_dir, cfg, meta_cols=("role",))
    full = InvertedIndex(spark, full_dir)

    q = "the data and"
    n_matches = int(full.match_docs(q).count())
    got = multi_index_topk(
        idxs, q, k=n_matches, with_meta=True,
        search_type="dfs_query_then_fetch",
    ).collect()
    want = full.topk(q, k=n_matches, with_meta=True).collect()
    gd = {(r["conv_id"], r["turn_idx"]): r["score"] for r in got}
    wd = {(r["conv_id"], r["turn_idx"]): r["score"] for r in want}
    assert set(gd) == set(wd) and len(gd) == n_matches > 0
    for key in gd:
        assert gd[key] == pytest.approx(wd[key], abs=1e-9), key

    # local-stats mode really uses LOCAL stats: for at least one doc the
    # score differs from the global-stats one (halves have different df)
    loc = multi_index_topk(idxs, q, k=n_matches, with_meta=True).collect()
    ld = {(r["conv_id"], r["turn_idx"]): r["score"] for r in loc}
    assert any(abs(ld[key] - gd[key]) > 1e-9 for key in ld if key in gd)

    with pytest.raises(ValueError, match="search_type"):
        multi_index_topk(idxs, q, search_type="nope")
    tx.unpersist()

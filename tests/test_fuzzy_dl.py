"""Exactness of the pure-Catalyst Damerau-Levenshtein predicate.

ES fuzzy defaults to transpositions=true (a Damerau transposition is ONE
edit, Running-ELK.md:186-200); the engine expresses DL <= max_dist as a
variant expansion over the literal query term (`InvertedIndex._dl_dist`). These
tests pin that construction to DuckDB's `damerau_levenshtein` — the value
oracle the driver gate runs — over randomized string pairs, and check the
prefix_length suffix semantics."""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from dart_importer_spark.query.engine import InvertedIndex


def _rand_terms(rng, n, alphabet="abcd", lo=0, hi=7):
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("max_dist", [1, 2])
def test_dl_dist_matches_duckdb(spark, max_dist):
    # Small alphabet maximizes collisions/transpositions per pair; includes
    # the freak unrestricted-DL cases (abc<->ca: delete-then-transpose).
    rng = random.Random(42 + max_dist)
    queries = ["abc", "ca", "tabel", "acb"] + _rand_terms(rng, 8, lo=1, hi=6)
    cands = list({c for c in (["ca", "abc", "table", "a"] + _rand_terms(rng, 300))})
    con = duckdb.connect()
    df = spark.createDataFrame([(c,) for c in cands], "term string")
    for q in queries:
        got = {
            r["term"]: r["d"]
            for r in df.select(
                "term", InvertedIndex._dl_dist(F.col("term"), q, max_dist).alias("d")
            ).collect()
        }
        for c in cands:
            want = con.execute(
                "select damerau_levenshtein(?, ?)", [c, q]
            ).fetchone()[0]
            want = min(want, max_dist + 1)  # _dl_dist saturates above max_dist
            assert got[c] == want, (q, c, got[c], want)


def test_dl_transposition_is_one_edit(spark):
    df = spark.createDataFrame([("table",)], "term string")
    d = df.select(InvertedIndex._dl_dist(F.col("term"), "tabel", 1).alias("d"))
    assert d.collect()[0]["d"] == 1


def test_fuzzy_prefix_length_fixes_leading_chars(built_index):
    # prefix_length=2: candidates must share 'th' exactly; edits apply to
    # the suffix only, so 'the' matches 'thz' (suffix e~z, 1 edit) but a
    # term differing in the prefix never does.
    rows = built_index.expand_fuzzy_df("thz", 1, prefix_length=2).collect()
    terms = {r["term"] for r in rows}
    assert "the" in terms
    assert all(t.startswith("th") for t in terms)


def test_fuzzy_transpositions_off_is_classic_levenshtein(built_index):
    dl = {r["term"] for r in built_index.expand_fuzzy_df("hte", 1).collect()}
    lv = {
        r["term"]
        for r in built_index.expand_fuzzy_df(
            "hte", 1, transpositions=False
        ).collect()
    }
    assert lv <= dl  # DL 1-ball contains the levenshtein 1-ball
    assert "the" in dl and "the" not in lv  # transposition counts 1 vs 2


def test_fuzziness_auto_bands(built_index):
    # AUTO: len<3 -> 0 edits (exact only); 3-5 -> 1; 6+ -> 2
    from dart_importer_spark.query.engine import InvertedIndex

    assert InvertedIndex._auto_fuzziness("ab") == 0
    assert InvertedIndex._auto_fuzziness("the") == 1
    assert InvertedIndex._auto_fuzziness("tables") == 2
    exact = {r["term"] for r in built_index.expand_fuzzy_df("th", "AUTO").collect()}
    assert exact <= {"th"}  # 2-char term: exact band, no neighbors
    one = {r["term"] for r in built_index.expand_fuzzy_df("thz", "AUTO").collect()}
    assert "the" in one
    with pytest.raises(ValueError):
        built_index.expand_fuzzy_df("thz", "AUTOO")

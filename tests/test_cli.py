"""CLI round-trip — the Spark-native counterpart of the reference's argparse
main (reference import_dart_data.py:682-719)."""

from __future__ import annotations

import json

from dart_importer_spark.cli import main


def _lines(capsys) -> list[dict]:
    return [json.loads(s) for s in capsys.readouterr().out.strip().splitlines() if s]


def test_cli_build_query_count_delete(spark, transcripts_df, tmp_path, capsys):
    inp = str(tmp_path / "tx_parquet")
    transcripts_df.write.parquet(inp)
    idx = str(tmp_path / "idx")

    assert main(["build", "--input", inp, "--index", idx,
                 "--segments", "4", "--buckets", "8"]) == 0
    (m,) = _lines(capsys)
    assert m["built_segments"] == [0, 1, 2, 3]
    n_docs = m["n_docs"]

    assert main(["count", "--index", idx]) == 0
    (c,) = _lines(capsys)
    assert c["count"] == n_docs

    assert main(["query", "--index", idx, "--q", "삼성 전자", "--k", "3"]) == 0
    hits = _lines(capsys)
    assert len(hits) == 3
    assert hits[0]["score"] >= hits[-1]["score"]
    assert {"doc_id", "score", "conv_id", "turn_idx"} <= set(hits[0])

    assert main(["query", "--index", idx, "--q", "the", "--k", "2",
                 "--where", "role = 'assistant'"]) == 0
    for h in _lines(capsys):
        assert h["role"] == "assistant"

    assert main(["delete", "--index", idx, "--where", "role = 'tool'"]) == 0
    (d,) = _lines(capsys)
    assert d["deleted"] > 0
    assert main(["count", "--index", idx]) == 0
    (c2,) = _lines(capsys)
    assert c2["count"] == n_docs - d["deleted"]


def test_cli_append_and_compact(spark, transcripts_df, tmp_path, capsys):
    from pyspark.sql import functions as F

    first = transcripts_df.filter(F.col("conv_id") < "conv00000150")
    second = transcripts_df.filter(F.col("conv_id") >= "conv00000150")
    inp1, inp2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    first.write.parquet(inp1)
    second.write.parquet(inp2)
    idx = str(tmp_path / "idx")

    assert main(["build", "--input", inp1, "--index", idx,
                 "--segments", "4", "--buckets", "8"]) == 0
    (b,) = _lines(capsys)
    assert main(["append", "--input", inp2, "--index", idx, "--tag", "t2"]) == 0
    (a,) = _lines(capsys)
    assert a["appended_docs"] == second.count()
    assert a["n_docs"] == transcripts_df.count()

    out = str(tmp_path / "idx2")
    assert main(["compact", "--index", idx, "--out", out]) == 0
    (c,) = _lines(capsys)
    assert c["n_docs"] == transcripts_df.count()
    assert main(["query", "--index", out, "--q", "삼성", "--k", "2"]) == 0
    assert len(_lines(capsys)) == 2


def test_cli_search_and_agg(spark, transcripts_df, tmp_path, capsys):
    """The round-3 search/agg subcommands reach the new query surface."""
    inp = str(tmp_path / "tx_parquet3")
    transcripts_df.write.parquet(inp)
    idx = str(tmp_path / "idx3")
    assert main(["build", "--input", inp, "--index", idx,
                 "--segments", "2", "--buckets", "4"]) == 0
    capsys.readouterr()

    assert main(["search", "--index", idx, "--type", "sqs",
                 "--q", "the -w00042", "--k", "3"]) == 0
    hits = _lines(capsys)
    assert 0 < len(hits) <= 3 and {"doc_id", "score"} <= set(hits[0])

    assert main(["search", "--index", idx, "--type", "suggest",
                 "--q", "thw", "--k", "3"]) == 0
    sugg = _lines(capsys)
    assert sugg and sugg[0]["term"] == "the" and sugg[0]["dist"] == 1

    assert main(["search", "--index", idx, "--type", "regexp",
                 "--q", "th.", "--k", "5"]) == 0
    assert len(_lines(capsys)) == 5

    assert main(["agg", "--index", idx, "--agg", "terms",
                 "--q", "the", "--by", "role"]) == 0
    buckets = _lines(capsys)
    assert buckets and {"role", "doc_count"} <= set(buckets[0])

    assert main(["agg", "--index", idx, "--agg", "cardinality",
                 "--q", "the", "--on", "role"]) == 0
    (card,) = _lines(capsys)
    assert card["value"] >= 2

    assert main(["agg", "--index", idx, "--agg", "collapse",
                 "--q", "the and", "--by", "role", "--k", "5"]) == 0
    col = _lines(capsys)
    assert col and len({r["role"] for r in col}) == len(col)

    # round-4 surface: match_bool_prefix, field sort, bucket_sort
    assert main(["search", "--index", idx, "--type", "bool_prefix",
                 "--q", "the w0", "--k", "5"]) == 0
    bp = _lines(capsys)
    assert bp and {"doc_id", "score"} <= set(bp[0])

    assert main(["search", "--index", idx, "--type", "sort",
                 "--q", "the", "--by", "dl", "--k", "5"]) == 0
    srt = _lines(capsys)
    assert srt and [r["dl"] for r in srt] == sorted(
        (r["dl"] for r in srt), reverse=True
    )

    assert main(["agg", "--index", idx, "--agg", "bucket_sort",
                 "--q", "the", "--by", "role", "--k", "2"]) == 0
    bs = _lines(capsys)
    assert 0 < len(bs) <= 2 and {"role", "doc_count"} <= set(bs[0])

    # this round's surface: sampler / diversified_sampler / significant_text
    assert main(["agg", "--index", idx, "--agg", "sampler",
                 "--q", "the and", "--by", "role", "--shard-size", "12",
                 "--k", "5"]) == 0
    sm = _lines(capsys)
    assert sm and sum(r["doc_count"] for r in sm) == 12
    assert main(["agg", "--index", idx, "--agg", "div_sampler",
                 "--q", "the and", "--by", "role", "--on", "conv_id",
                 "--shard-size", "8", "--max-per-value", "1", "--k", "5"]) == 0
    dv = _lines(capsys)
    assert dv and sum(r["doc_count"] for r in dv) <= 8
    assert main(["agg", "--index", idx, "--agg", "sig_text",
                 "--q", "the", "--k", "5", "--shard-size", "10"]) == 0
    st = _lines(capsys)
    assert st and {"term", "score"} <= set(st[0])

    import json as _json
    body = tmp_path / "rank_eval.json"
    body.write_text(_json.dumps({
        "requests": [
            {"id": "a", "query": "the and", "ratings": {"0": 2, "3": 1}},
            {"id": "b", "query": "zzznotaterm", "ratings": {"1": 1}},
        ],
        "metric": {"precision": {"k": 5}},
    }))
    assert main(["rank-eval", "--index", idx,
                 "--body-file", str(body)]) == 0
    re_rows = _lines(capsys)
    byid = {r["req_id"]: r["score"] for r in re_rows}
    assert set(byid) == {"a", "b", "_mean"} and byid["b"] == 0.0


def test_cli_dsl_body(spark, transcripts_df, tmp_path, capsys):
    """The dsl subcommand runs a verbatim ES _search JSON body."""
    inp = str(tmp_path / "tx_parquet4")
    transcripts_df.write.parquet(inp)
    idx = str(tmp_path / "idx4")
    assert main(["build", "--input", inp, "--index", idx,
                 "--segments", "2", "--buckets", "4"]) == 0
    capsys.readouterr()

    body = json.dumps({
        "query": {"bool": {
            "must": [{"match": {"text": "the"}}],
            "filter": [{"term": {"role": "user"}}],
        }},
        "size": 5,
    })
    assert main(["dsl", "--index", idx, "--body", body]) == 0
    hits = _lines(capsys)
    assert 0 < len(hits) <= 5 and {"doc_id", "score"} <= set(hits[0])

    assert main(["dsl", "--index", idx, "--body", body, "--count"]) == 0
    (c,) = _lines(capsys)
    assert c["count"] >= len(hits)

    agg_body = json.dumps({
        "query": {"match": {"text": "the"}},
        "aggs": {"roles": {"terms": {"field": "role", "size": 5}}},
    })
    assert main(["dsl", "--index", idx, "--body", agg_body, "--aggs"]) == 0
    buckets = _lines(capsys)
    assert buckets and buckets[0]["agg"] == "roles"
    assert {"role", "doc_count"} <= set(buckets[0])

    bf = tmp_path / "body.json"
    bf.write_text(body)
    assert main(["dsl", "--index", idx, "--body-file", str(bf)]) == 0
    assert _lines(capsys) == hits

    # --scan streams every matching doc as NDJSON (helpers.scan parity)
    assert main(["dsl", "--index", idx, "--body", body, "--scan"]) == 0
    docs = _lines(capsys)
    assert len(docs) == c["count"]
    assert {"_id", "_source"} <= set(docs[0])
    assert docs[0]["_source"]["role"] == "user"


def test_cli_field_caps_terms_enum_validate(spark, transcripts_df, tmp_path,
                                            capsys):
    inp = str(tmp_path / "tx_parquet5")
    transcripts_df.write.parquet(inp)
    idx = str(tmp_path / "idx5")
    assert main(["build", "--input", inp, "--index", idx,
                 "--segments", "2", "--buckets", "4"]) == 0
    capsys.readouterr()

    assert main(["field-caps", "--index", idx]) == 0
    caps = json.loads(capsys.readouterr().out)["fields"]
    assert caps["text"]["type"] == "text"
    assert caps["role"]["aggregatable"] is True

    assert main(["terms-enum", "--index", idx, "--field", "role"]) == 0
    (te,) = _lines(capsys)
    assert te["terms"] == sorted(te["terms"]) and len(te["terms"]) >= 2

    good = json.dumps({"query": {"match": {"text": "the"}}})
    assert main(["dsl", "--index", idx, "--body", good, "--validate"]) == 0
    (v,) = _lines(capsys)
    assert v["valid"] is True

    bad = json.dumps({"query": {"bogus_clause": {}}})
    assert main(["dsl", "--index", idx, "--body", bad, "--validate"]) == 0
    (v,) = _lines(capsys)
    assert v["valid"] is False and "bogus_clause" in v["explanation"]


def test_cli_msearch_ndjson(spark, transcripts_df, tmp_path, capsys):
    inp = str(tmp_path / "tx_parquet6")
    transcripts_df.write.parquet(inp)
    idx = str(tmp_path / "idx6")
    assert main(["build", "--input", inp, "--index", idx,
                 "--segments", "2", "--buckets", "4"]) == 0
    capsys.readouterr()

    nd = tmp_path / "msearch.ndjson"
    nd.write_text("\n".join([
        "{}",
        json.dumps({"query": {"match": {"text": "the"}}, "size": 3}),
        "{}",
        json.dumps({"query": {"term": {"role": "user"}}, "size": 2}),
    ]) + "\n")
    assert main(["msearch", "--index", idx, "--body-file", str(nd)]) == 0
    rows = _lines(capsys)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"s0", "s1"}
    assert len(by_q["s0"]) == 3 and len(by_q["s1"]) == 2
    scores = [r["score"] for r in by_q["s0"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_esql_and_script_score(spark, transcripts_df, tmp_path, capsys):
    inp = str(tmp_path / "tx_parquet")
    transcripts_df.write.parquet(inp)
    idx = str(tmp_path / "idx")
    assert main(["build", "--input", inp, "--index", idx,
                 "--segments", "2", "--buckets", "4"]) == 0
    capsys.readouterr()

    assert main([
        "esql", "--index", idx, "--query",
        'FROM idx METADATA _score | WHERE MATCH(text, "the w00100") '
        "| EVAL s = ROUND(_score, 6) | KEEP doc_id, s, role "
        "| SORT s DESC, doc_id ASC | LIMIT 3",
    ]) == 0
    hits = _lines(capsys)
    assert len(hits) == 3 and hits[0]["s"] >= hits[-1]["s"]
    assert {"doc_id", "s", "role"} == set(hits[0])

    assert main([
        "esql", "--index", idx, "--query",
        "FROM idx | STATS n = COUNT(*) BY role | SORT n DESC",
    ]) == 0
    rows = _lines(capsys)
    assert sum(r["n"] for r in rows) > 0

    assert main([
        "script-score", "--index", idx, "--q", "the w00100",
        "--script", "_score * Math.log1p(doc['dl'].value / params.d)",
        "--params", '{"d": 10.0}', "--k", "3",
    ]) == 0
    ss = _lines(capsys)
    assert len(ss) == 3 and ss[0]["score"] >= ss[-1]["score"]

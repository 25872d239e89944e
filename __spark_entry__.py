"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operator surface (SURVEY.md §2) over
the driver's parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL. Full-text queries run through the real engine (segmented inverted
index + BM25) built over the ``documents`` table; the DuckDB oracle
recomputes BM25 from first principles with the same pinned tokenizer regex.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dart_importer_spark.functions.tokenizer import TOKEN_PATTERN  # noqa: E402
from dart_importer_spark.operators import dedup, similarity, text as textops  # noqa: E402

K1, B = 1.2, 0.75
_INDEX_CACHE: dict[str, str] = {}


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _documents_index(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) the inverted index over documents."""
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        out = os.path.join(
            "/tmp/dis_entry_index", key.strip("/").replace("/", "_")
        )
        docs = _load(spark, sf_dir, "documents").withColumnRenamed("doc_id", "src_id")
        build_index(
            spark,
            docs,
            out,
            BuildConfig(n_segments=4, n_buckets=8),
            doc_key_cols=("src_id",),
            text_col="text",
            meta_cols=("lang", "source", "n_chars"),
        )
        _INDEX_CACHE[key] = out
    return InvertedIndex(spark, _INDEX_CACHE[key])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over documents at sf0.001 through the engine."""
    ix = _documents_index(spark, "/root/testdata/sf0.001")
    return ix.topk("spark join stream", k=10, round_scores=6)


# --------------------------------------------------------------------------
# DuckDB BM25 oracle template — same tokenizer spec, same Lucene idf/tf norm,
# same (rounded score desc, doc_id asc) tie-break as the engine.
# --------------------------------------------------------------------------
def _bm25_oracle(
    terms: list[str],
    k: int,
    mode: str = "or",
    doc_filter: str | None = None,
) -> str:
    qlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    filter_join = (
        f"JOIN docs d ON d.did = tf.did AND ({doc_filter})" if doc_filter else ""
    )
    having = f"HAVING count(*) = (SELECT count(*) FROM q)" if mode == "and" else ""
    return f"""
WITH docs AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS did, text, lang, source, n_chars
  FROM documents
),
tok AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM docs
),
tf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (
  SELECT did, len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))::DOUBLE AS dl
  FROM docs
),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q AS (SELECT unnest([{qlist}]) AS term),
scored AS (
  SELECT tf.did AS doc_id,
         sum(
           ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
           * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))
         ) AS raw_score
  FROM tf
  JOIN q USING (term)
  JOIN dft USING (term)
  JOIN dl ON dl.did = tf.did
  CROSS JOIN stats s
  {filter_join}
  GROUP BY tf.did
  {having}
)
SELECT doc_id, round(raw_score, 6) AS score
FROM scored
ORDER BY round(raw_score, 6) DESC, doc_id ASC
LIMIT {k}
"""


_DOCS_CTE = f"""
WITH docs AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS did, text, lang, source, n_chars
  FROM documents
),
tok AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM docs
)
"""


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------
def _ft(query: str, k: int = 20, mode: str = "or", filters=None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ix = _documents_index(spark, sf_dir)
        f = filters() if callable(filters) else filters
        return ix.topk(query, k=k, mode=mode, filters=f, round_scores=6)

    return run


def q_ft_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = _documents_index(spark, sf_dir)
    return spark.createDataFrame([(ix.count(),)], "n long")


def q_ft_get_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = _documents_index(spark, sf_dir)
    return ix.get_by_key(7).select("doc_id", "src_id", "lang", "source", "dl")


def q_ft_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = _documents_index(spark, sf_dir)
    return ix.wildcard("mer", k=50).select(
        "doc_id", F.col("score").cast("double").alias("score")
    )


def q_tx_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return textops.with_token_count(docs).select("doc_id", "n_tokens")


def q_tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    cols = textops.quality_columns("text")
    return docs.select(
        "doc_id",
        cols["n_tokens"].alias("n_tokens"),
        F.round(cols["alnum_ratio"], 6).alias("alnum_ratio"),
        cols["stopword_hits"].alias("stopword_hits"),
    )


def q_dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


def q_sim_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = similarity.brute_force_cosine_topk(emb, list(qvec), k=10)
    return out.select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_etl_proj_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P1: projection + rename (reference generate_corp_code_doc,
    # import_dart_data.py:114-135)
    return _load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("_id"), F.col("r_name").alias("name")
    )


def q_etl_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P4: equality filter (reference analyze_corp_info, :296-302)
    return (
        _load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )


def q_etl_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1: the reference's N+1 point-lookup loop (import_dart_data.py:219-230,
    # 564-565) collapsed into one broadcast hash join
    orders = _load(spark, sf_dir, "orders")
    customer = _load(spark, sf_dir, "customer")
    return orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


def q_etl_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2: resume anti-join (reference has_corp_data skip, :543-550)
    customer = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_etl_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q4/J3: range predicate (reference date_range field + range filter,
    # Running-ELK.md:241-246)
    return (
        _load(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= "2024-01-03 00:00:00") & (F.col("ts") < "2024-01-05 00:00:00")
        )
        .select("event_id", "user_id")
    )


def q_etl_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1: count(*) (reference check_corp_code_imported, :305-321)
    return _load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


def q_etl_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2: per-key filtered counts (reference has_corp_data, :513-533)
    return (
        _load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def q_etl_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A3/A4 + TPC-H Q1 shape: hash aggregate with partial/final split
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("count_order"),
        )
    )


def q_etl_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O1/O2: server-side sort + pagination (reference :70-76)
    return (
        _load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def q_etl_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P2/F1: quarter date_range enrichment (reference _get_time_frame,
    # import_dart_data.py:628-641) as pure built-ins
    ev = _load(spark, sf_dir, "events")
    qs = F.to_date(F.date_trunc("quarter", F.col("ts")))
    return ev.select(
        "event_id", qs.alias("qs"), F.last_day(F.add_months(qs, 2)).alias("qe")
    )


def q_etl_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F4/P6: regex extraction (reference manage_dart_file.py:55,65,90)
    return _load(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)", 1).cast("long").alias("src_num"),
    )


def q_etl_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F6: JSON parse (reference r.json()/json.dumps, :157,190)
    return _load(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- full-text engine (Q1-Q12 of SURVEY.md §2.8) ---
        "ft_match_single": _ft("data", k=20),
        "ft_match_multi": _ft("spark join stream", k=20),
        "ft_match_and": _ft("filter window", k=20, mode="and"),
        "ft_filter_lang": _ft("table", k=20, filters=lambda: F.col("lang") == "en"),
        "ft_range_nchars": _ft(
            "query", k=20, filters=lambda: (F.col("n_chars") >= 100) & (F.col("n_chars") < 400)
        ),
        "ft_deep_topk": _ft("merge sort", k=100),
        "ft_wildcard_prefix": q_ft_wildcard,
        "ft_count": q_ft_count,
        "ft_get_by_id": q_ft_get_by_id,
        # --- training-data ops ---
        "tx_token_count": q_tx_token_count,
        "tx_quality": q_tx_quality,
        "dd_exact": q_dd_exact,
        "sim_bruteforce_cosine": q_sim_bruteforce,
        # --- ETL parity (SURVEY.md §2.1-2.7) ---
        "etl_proj_rename": q_etl_proj_rename,
        "etl_filter_eq": q_etl_filter_eq,
        "etl_broadcast_join": q_etl_broadcast_join,
        "etl_anti_join": q_etl_anti_join,
        "etl_range_filter": q_etl_range_filter,
        "etl_count": q_etl_count,
        "etl_filtered_count": q_etl_filtered_count,
        "etl_group_agg": q_etl_group_agg,
        "etl_sort_limit": q_etl_sort_limit,
        "etl_time_frame": q_etl_time_frame,
        "etl_regex_extract": q_etl_regex_extract,
        "etl_json": q_etl_json,
    }


def oracle_sql() -> dict[str, str]:
    tok = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"
    return {
        "ft_match_single": _bm25_oracle(["data"], 20),
        "ft_match_multi": _bm25_oracle(["spark", "join", "stream"], 20),
        "ft_match_and": _bm25_oracle(["filter", "window"], 20, mode="and"),
        "ft_filter_lang": _bm25_oracle(["table"], 20, doc_filter="d.lang = 'en'"),
        "ft_range_nchars": _bm25_oracle(
            ["query"], 20, doc_filter="d.n_chars >= 100 AND d.n_chars < 400"
        ),
        "ft_deep_topk": _bm25_oracle(["merge", "sort"], 100),
        "ft_wildcard_prefix": _DOCS_CTE
        + """
SELECT DISTINCT did AS doc_id, CAST(1.0 AS DOUBLE) AS score
FROM tok WHERE term LIKE 'mer%'
ORDER BY doc_id ASC LIMIT 50
""",
        "ft_count": "SELECT count(*) AS n FROM documents",
        "ft_get_by_id": f"""
WITH docs AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS did, *
  FROM documents
)
SELECT did AS doc_id, doc_id AS src_id, lang, source,
       len({tok})::BIGINT AS dl
FROM docs WHERE did = 7
""",
        "tx_token_count": f"SELECT doc_id, len({tok})::BIGINT AS n_tokens FROM documents",
        "tx_quality": f"""
SELECT doc_id,
       len({tok})::BIGINT AS n_tokens,
       round(length(regexp_replace(text, '[^0-9A-Za-z가-힣一-鿿]', '', 'g'))::DOUBLE
             / greatest(length(text), 1), 6) AS alnum_ratio,
       len(list_intersect(list_distinct({tok}),
           ['the','and','of','to','a','in','is','it','you','that']))::BIGINT AS stopword_hits
FROM documents
""",
        "dd_exact": "SELECT min(doc_id) AS rep_id, count(*) AS n_dups FROM documents GROUP BY text",
        "sim_bruteforce_cosine": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS c
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, round(c, 4) AS cosine FROM scored
ORDER BY c DESC, vec_id ASC LIMIT 10
""",
        "etl_proj_rename": "SELECT r_regionkey AS _id, r_name AS name FROM region",
        "etl_filter_eq": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
        "etl_broadcast_join": """
SELECT o_orderkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
        "etl_anti_join": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
        "etl_range_filter": """
SELECT event_id, user_id FROM events
WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-05 00:00:00'
""",
        "etl_count": "SELECT count(*) AS n FROM lineitem",
        "etl_filtered_count": "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
        "etl_group_agg": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "etl_sort_limit": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
        "etl_time_frame": """
SELECT event_id,
       date_trunc('quarter', ts)::DATE AS qs,
       (date_trunc('quarter', ts) + INTERVAL 3 MONTH - INTERVAL 1 DAY)::DATE AS qe
FROM events
""",
        "etl_regex_extract": """
SELECT doc_id, regexp_extract(source, '([0-9]+)', 1)::BIGINT AS src_num FROM documents
""",
        "etl_json": "SELECT event_id, json_extract(props, '$.k')::INT AS k FROM events",
    }

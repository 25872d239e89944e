"""Pattern-mining operators over transcript-shaped tables.

Two mining primitives a training-data pipeline runs over conversation /
event logs, both pure DataFrame plans (no Python in the hot path):

- :func:`frequent_item_sets` — the ES ``frequent_item_sets`` aggregation
  (which tools / event types co-occur within a conversation), as
  distributed Apriori: frequent singletons are broadcast to prune the
  group-co-partitioned self-joins that count pairs and triples.
- :func:`dup_ngram_stats` — per-document duplicated-n-gram fraction (the
  "how much of this doc is boilerplate shared with other docs" signal
  used to filter training corpora, cf. the repeated-substring dedup
  literature): one n-gram document-frequency aggregation + one join back.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def frequent_item_sets(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: float = 0.1,
    max_size: int = 3,
) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation: item sets (size 1..max_size)
    that occur together in at least ``min_support`` of the groups.
    Presence-based (multiplicity within a group does not count), like ES.

    Returns (items "a|b|c" sorted within the set, size, support_count,
    support) ordered by size asc, support_count desc, items asc.

    Scale shape: the Apriori candidate joins are equi-joins on
    ``group_col`` — co-partitioned, one shuffle amortized across levels —
    and each side is first semi-joined against the BROADCAST frequent-
    singleton dictionary, so candidate volume is bounded by the classic
    Apriori property before anything wide happens. For deep itemsets
    (max_size > 3) switch to MLlib's FP-Growth; the ES agg caps at small
    sizes where Apriori's bounded passes beat FP-tree construction.
    """
    if not 1 <= max_size <= 3:
        raise ValueError(f"frequent_item_sets: max_size in 1..3, got {max_size}")
    if not 0.0 < min_support <= 1.0:
        raise ValueError(
            f"frequent_item_sets: min_support in (0, 1], got {min_support}"
        )
    g, it = F.col(group_col), F.col(item_col)
    items = (
        df.select(g.alias("g"), it.cast("string").alias("i"))
        .filter(F.col("i").isNotNull())
        .distinct()
    )
    n_groups = items.select("g").distinct().count()
    if n_groups == 0:
        from ..functions.localrel import local_df
        return local_df(
            items.sparkSession,
            [], "items string, size int, support_count long, support double"
        )
    min_count = max(1, math.ceil(min_support * n_groups))

    def finish(counted: DataFrame, size: int, key_cols: list[str]) -> DataFrame:
        return counted.filter(F.col("support_count") >= min_count).select(
            F.concat_ws("|", *key_cols).alias("items"),
            F.lit(size).alias("size"),
            F.col("support_count"),
            F.round(F.col("support_count") / F.lit(float(n_groups)), 6).alias(
                "support"
            ),
        )

    f1_counted = items.groupBy("i").agg(F.count("*").alias("support_count"))
    out = finish(f1_counted, 1, ["i"])
    if max_size >= 2:
        f1 = f1_counted.filter(F.col("support_count") >= min_count).select("i")
        pruned = items.join(F.broadcast(f1), "i").select("g", "i")
        a = pruned.alias("a")
        b = pruned.alias("b")
        pairs = a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.i") < F.col("b.i"))).select(
            F.col("a.g").alias("g"),
            F.col("a.i").alias("i1"),
            F.col("b.i").alias("i2"),
        )
        p_counted = pairs.groupBy("i1", "i2").agg(
            F.count("*").alias("support_count")
        )
        out = out.unionByName(finish(p_counted, 2, ["i1", "i2"]))
        if max_size >= 3:
            fp = p_counted.filter(F.col("support_count") >= min_count).select(
                "i1", "i2"
            )
            base = pairs.join(F.broadcast(fp), ["i1", "i2"])
            triples = base.join(
                pruned.alias("c"),
                (F.col("c.g") == base["g"]) & (F.col("c.i") > base["i2"]),
            ).select(base["g"], "i1", "i2", F.col("c.i").alias("i3"))
            t_counted = triples.groupBy("i1", "i2", "i3").agg(
                F.count("*").alias("support_count")
            )
            out = out.unionByName(finish(t_counted, 3, ["i1", "i2", "i3"]))
    return out.orderBy(
        F.asc("size"), F.desc("support_count"), F.asc("items")
    )


def dup_ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Per-document duplicated-n-gram fraction: tokenize (lowercase,
    split on non-alphanumerics), form word n-grams, and for each doc
    report how many of its n-gram occurrences also appear in >= min_df
    DISTINCT documents. High dup_fraction flags boilerplate / templated
    / crawled-twice text that exact- and MinHash-dedup both miss when
    only a SPAN of the document is duplicated.

    Returns (id, n_ngrams, n_dup, dup_fraction) for every doc with at
    least one n-gram.

    Scale shape: one groupBy on the n-gram string for document frequency
    + one join back — the standard two-pass plan. The n-gram key is wide;
    at corpus scale pre-hash it (xxhash64) to an 8-byte shuffle key and
    accept ~n²/2⁶⁴ collision odds; kept as the exact string here so the
    result is bit-reproducible against a SQL oracle.
    """
    if n < 1:
        raise ValueError(f"dup_ngram_stats: n >= 1, got {n}")
    # materialize the token array BEFORE the transform lambda: a split
    # expression referenced inside the lambda is re-evaluated once per
    # n-gram position — quadratic re-tokenization per document
    toked = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != "",
        ).alias("_tk"),
    )
    ngrams = F.when(
        F.size("_tk") >= n,
        F.expr(
            f"transform(sequence(1, size(_tk) - {n - 1}), "
            f"i -> array_join(slice(_tk, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    rows = toked.select("id", F.explode(ngrams).alias("ng"))
    dfreq = rows.groupBy("ng").agg(
        F.count_distinct("id").alias("ng_docs")
    )
    return (
        rows.join(dfreq, "ng")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(
                F.when(F.col("ng_docs") >= min_df, 1).otherwise(0)
            ).alias("n_dup"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup") / F.col("n_ngrams"), 6),
        )
        .orderBy("id")
    )

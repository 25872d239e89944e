"""dart_importer_spark — a PySpark-native inverted-index + BM25 top-k engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference repo ``tohichoi/dart-importer`` (which delegates all indexing and
full-text query to Elasticsearch/Lucene). Here the inverted index — posting
lists, compression, document statistics, merge, block-max top-k scoring — is
built natively on Spark DataFrames plus vectorized pandas/Arrow UDFs.

Layout
------
- ``functions``  : tokenizer (pinned spec), varbyte/delta codec, text analysis
- ``index``      : index build (postings/term_dict/doc_stats/corpus_stats),
                   lineage manifests + checkpoint-resume, segment merge
- ``query``      : BM25 top-k (block-max pruning), bool/term/range/exists/
                   wildcard/fuzzy filters, count, get-by-id
- ``operators``  : dedup (exact/minhash-LSH/simhash/ngram-jaccard/embedding),
                   similarity search (brute-force + LSH ANN), multimodal stubs
- ``etl``        : ETL-parity operators mirroring the reference Python layer
- ``streaming``  : incremental index refresh (foreachBatch over segment build)
"""

__version__ = "0.1.0"

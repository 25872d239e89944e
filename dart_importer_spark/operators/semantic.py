"""ES ``semantic_text`` parity: chunk -> embed -> late-interaction search.

ES 8.15's ``semantic_text`` field type chunks each document, embeds every
chunk through an inference endpoint, and serves ``semantic`` queries by
embedding the query text and scoring chunks. Same pipeline, Spark-first:

- :func:`embed_chunks` — ``sampling.chunk_text`` windows + ONE
  Arrow-batched ``mapInPandas`` pass of the pluggable embedder. The
  default embedder is FEATURE HASHING (each token hashes to a seeded
  pseudo-random unit direction; a chunk is the L2-normalized sum): a
  real lexical baseline (random-projection bag-of-words, Weinberger et
  al. 2009), fully deterministic, no model download. Swap
  :func:`set_embedder` for a true model endpoint on a real cluster —
  the same pluggable-stub contract as ``multimodal.set_decoder`` and
  the ES|QL RERANK/COMPLETION inference endpoints.
- :func:`semantic_topk` — embed the query string driver-side (one
  embedder call), rank docs by the best chunk dot product
  (``fold_vectors`` + ``max_sim_topk`` with a single query vector —
  maxSim degenerates to best-chunk, exactly how ES scores
  semantic_text with one query embedding). At corpus scale the
  candidate stage swaps to :func:`similarity.max_sim_ann` over an IVF
  index of the chunk vectors.

UDF contract: the embedder runs as an Arrow-batched ``mapInPandas``
kernel (vectorized, never row-at-a-time); everything before and after
it is pure Catalyst.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import sampling, similarity
from ..functions.partitioning import widen_for_python

_TOKEN_RE = re.compile(r"[^\W_]+")  # unicode word runs, any script
_CJK_RE = re.compile(r"[㐀-鿿豈-﫿]")


def _tokens(text: str) -> list[str]:
    """Unicode tokenization for the default embedder: word runs in any
    script; runs containing CJK (no space boundaries) expand to character
    bigrams (unigram for a single char) — the same convention as the
    engine's pinned CJK tokenizer."""
    out: list[str] = []
    for tok in _TOKEN_RE.findall(str(text).lower()):
        if _CJK_RE.search(tok):
            if len(tok) == 1:
                out.append(tok)
            else:
                out.extend(tok[i:i + 2] for i in range(len(tok) - 1))
        else:
            out.append(tok)
    return out


def _hash_embed(texts: pd.Series, dim: int, seed: int) -> np.ndarray:
    """Feature-hashing embedder: deterministic, vectorized per batch.
    Each distinct token seeds a PCG64 draw of a dim-normal direction
    (blake2b(token) -> seed, so identical across partitions/sessions);
    a text's vector is the L2-normalized token sum. Empty texts embed
    to the zero vector."""
    cache: dict[str, np.ndarray] = {}
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        for tok in _tokens(t):
            v = cache.get(tok)
            if v is None:
                h = int.from_bytes(
                    hashlib.blake2b(
                        tok.encode(), digest_size=8
                    ).digest(),
                    "big",
                )
                v = np.random.default_rng(h ^ seed).standard_normal(dim)
                cache[tok] = v
            out[i] += v
    norms = np.linalg.norm(out, axis=1)
    nz = norms > 0
    out[nz] /= norms[nz, None]
    return out.astype(np.float32)


_embedder: Callable[[pd.Series], np.ndarray] | None = None


def set_embedder(fn: Callable[[pd.Series], np.ndarray] | None) -> None:
    """Install a real inference endpoint: ``fn(texts) -> (n, dim)
    float array``. ``None`` restores the feature-hashing default."""
    global _embedder
    _embedder = fn


def _embed_series(texts: pd.Series, dim: int, seed: int) -> np.ndarray:
    if _embedder is not None:
        return np.asarray(_embedder(texts), dtype=np.float32)
    return _hash_embed(texts, dim, seed)


def embed_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    overlap: int = 0,
    dim: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Chunk ``text_col`` and embed every chunk: (id, chunk_id, vec)
    rows — the flat chunk-vector table (feed to ``fold_vectors`` for
    rank_vectors retrieval, or to ``IvfAnnIndex`` for the ANN stage).
    One Catalyst chunking projection + one Arrow embedder pass; no
    shuffle."""
    chunks = sampling.chunk_text(docs, id_col, text_col, chunk_size, overlap)

    # snapshot the pluggable endpoint into the closure NOW: executors
    # re-import this module, so reading the module global at execution
    # time would always see the default
    fn = _embedder

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            if fn is not None:
                vecs = np.asarray(fn(pdf["chunk"]), dtype=np.float32)
            else:
                vecs = _hash_embed(pdf["chunk"], dim, seed)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "chunk_id": pdf["chunk_id"],
                    "vec": [v for v in vecs],
                }
            )

    id_type = dict(chunks.dtypes)["id"]
    # single-file corpora scan as one partition; widen so the embedder
    # pass uses every core (no-op at scale — see partitioning module)
    return widen_for_python(chunks, "id").mapInPandas(
        kernel, f"id {id_type}, chunk_id int, vec array<float>"
    )


def semantic_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    overlap: int = 0,
    dim: int = 64,
    seed: int = 0,
) -> DataFrame:
    """The semantic_text field materialized: one row per doc carrying its
    ordered chunk vectors (rank_vectors shape). Persist this next to the
    index the way ES stores the inference results in the _source."""
    emb = embed_chunks(
        docs, id_col, text_col, chunk_size, overlap, dim, seed
    )
    return similarity.fold_vectors(emb, "id", "vec", "chunk_id")


def semantic_topk(
    index_df: DataFrame,
    query_text: str,
    k: int = 10,
    dim: int = 64,
    seed: int = 0,
    id_col: str = "id",
    vecs_col: str = "vecs",
) -> DataFrame:
    """ES ``semantic`` query: embed the query (ONE driver-side embedder
    call), score every doc by its best chunk's dot product — cosine,
    since all vectors are unit-normalized. Returns (id, score) top-k."""
    qv = _embed_series(pd.Series([query_text]), dim, seed)[0]
    if not float(np.linalg.norm(qv)) > 0:
        raise ValueError(
            "semantic_topk: query embedded to the zero vector (no "
            "tokens) — every doc would score 0.0, which is noise, not "
            "a ranking"
        )
    return similarity.max_sim_topk(
        index_df, [list(map(float, qv))], k=k,
        id_col=id_col, vecs_col=vecs_col,
    )

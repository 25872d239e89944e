"""Pure pandas/numpy BM25 oracle — brute-force ground truth for rank-identity.

Shares the engine's pinned tokenizer (FIXTURES.md 'Tokenizer pin') and the
same Lucene-style BM25 (k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5))),
mirroring the golden-value test style of the reference (exact corpus count at
reference test.py:80, point-lookup equality at test.py:62-70).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from dart_importer_spark.functions.tokenizer import tokenize_text
from dart_importer_spark.index.build import B, K1


class BM25Oracle:
    def __init__(self, docs: pd.DataFrame, text_col: str = "text"):
        """docs must carry a ``doc_id`` column (stable dense rank)."""
        self.docs = docs.reset_index(drop=True)
        self.doc_ids = docs["doc_id"].to_numpy(dtype=np.int64)
        self.tokens = [tokenize_text(t) for t in docs[text_col].fillna("")]
        self.tf = [Counter(toks) for toks in self.tokens]
        self.dl = np.array([len(t) for t in self.tokens], dtype=np.float64)
        self.n_docs = len(self.tokens)
        self.avgdl = float(self.dl.mean()) if self.n_docs else 0.0
        self.df: Counter = Counter()
        for c in self.tf:
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))

    def scores(self, query: str, mode: str = "or") -> pd.DataFrame:
        """Per-doc BM25 totals; mode='and' keeps docs matching all terms."""
        terms = sorted(set(tokenize_text(query)))
        terms = [t for t in terms if t in self.df]
        score = np.zeros(self.n_docs, dtype=np.float64)
        nmatch = np.zeros(self.n_docs, dtype=np.int64)
        for t in terms:  # term-sorted summation order, float64
            w = self.idf(t)
            tf = np.array([c.get(t, 0) for c in self.tf], dtype=np.float64)
            has = tf > 0
            denom = tf + K1 * (1.0 - B + B * self.dl / self.avgdl)
            with np.errstate(invalid="ignore", divide="ignore"):
                contrib = np.where(has, w * tf / denom, 0.0)
            score += contrib
            nmatch += has
        out = pd.DataFrame(
            {"doc_id": self.doc_ids, "score": score, "n_matched": nmatch}
        )
        out = out[out["n_matched"] > 0]
        if mode == "and":
            out = out[out["n_matched"] == len(terms)]
        return out

    def topk(
        self,
        query: str,
        k: int = 10,
        mode: str = "or",
        mask: np.ndarray | None = None,
    ) -> pd.DataFrame:
        """Top-k with the engine's tie-break (score desc, doc_id asc).

        ``mask``: optional boolean ndarray aligned to self.docs rows —
        the oracle analogue of non-scoring bool filters.
        """
        s = self.scores(query, mode=mode)
        if mask is not None:
            allowed = set(self.doc_ids[mask].tolist())
            s = s[s["doc_id"].isin(allowed)]
        s = s.sort_values(["score", "doc_id"], ascending=[False, True])
        return s.head(k).reset_index(drop=True)[["doc_id", "score"]]

"""BM25 inverted index for sparse/lexical search.

Capability match for the reference's sharded BM25 index
(reference: bm25_inverted_index.go:15-300; TF-IDF InvertedIndex
inverted_index.go:12). The reference shards term/doc maps for lock
concurrency under Go's scheduler; the Python serving edge is
single-writer so a flat index with numpy scoring is both simpler and
faster here.
"""
from __future__ import annotations

import math
import re
import threading
from collections import defaultdict
from typing import Optional

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


class BM25Index:
    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1 = k1
        self.b = b
        self._postings: dict[str, dict] = defaultdict(dict)  # term -> {doc: tf}
        self._doc_len: dict = {}
        self._total_len = 0
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._doc_len)

    def add(self, doc_id, text: str) -> None:
        toks = tokenize(text)
        with self._lock:
            old = self._doc_len.pop(doc_id, None)
            if old is not None:
                self._total_len -= old
                for term_docs in self._postings.values():
                    term_docs.pop(doc_id, None)
            self._doc_len[doc_id] = len(toks)
            self._total_len += len(toks)
            for t in toks:
                self._postings[t][doc_id] = self._postings[t].get(doc_id, 0) + 1
        try:
            from longbow_tpu.metrics import get_registry

            get_registry().inc("longbow_bm25_documents_indexed_total")
        except Exception:
            pass  # metrics must never fail an index write

    def remove(self, doc_id) -> None:
        with self._lock:
            old = self._doc_len.pop(doc_id, None)
            if old is None:
                return
            self._total_len -= old
            for term_docs in self._postings.values():
                term_docs.pop(doc_id, None)

    def search(
        self, query: str, k: int, allowed: Optional[set] = None
    ) -> list[tuple]:
        """-> [(doc_id, bm25_score)] best-first. `allowed` restricts
        results (the roaring-bitmap filter path,
        bm25_inverted_index.go:195)."""
        toks = tokenize(query)
        n = len(self._doc_len)
        if n == 0 or not toks:
            return []
        avg_len = self._total_len / n
        scores: dict = defaultdict(float)
        for t in set(toks):
            docs = self._postings.get(t)
            if not docs:
                continue
            idf = math.log(1.0 + (n - len(docs) + 0.5) / (len(docs) + 0.5))
            for doc, tf in docs.items():
                if allowed is not None and doc not in allowed:
                    continue
                dl = self._doc_len[doc]
                denom = tf + self.k1 * (1 - self.b + self.b * dl / avg_len)
                scores[doc] += idf * tf * (self.k1 + 1) / denom
        return sorted(scores.items(), key=lambda kv: -kv[1])[:k]

    def export_state(self) -> dict:
        return {
            "k1": self.k1,
            "b": self.b,
            "postings": {t: dict(d) for t, d in self._postings.items()},
            "doc_len": dict(self._doc_len),
        }

    @classmethod
    def import_state(cls, st: dict) -> "BM25Index":
        idx = cls(st["k1"], st["b"])
        idx._postings = defaultdict(dict, {
            t: dict(d) for t, d in st["postings"].items()
        })
        idx._doc_len = dict(st["doc_len"])
        idx._total_len = sum(idx._doc_len.values())
        return idx

"""BM25 inverted index for sparse/lexical search.

Capability match for the reference's sharded BM25 index
(reference: bm25_inverted_index.go:15-300; TF-IDF InvertedIndex
inverted_index.go:12). The reference shards term/doc maps for lock
concurrency under Go's scheduler; the Python serving edge is
single-writer, so this keeps a flat index and gets its speed from
numpy instead: docs map to dense slots, each term's postings
materialize once as (slots, tfs) arrays, and a query is a handful of
vectorized gathers + one argpartition — the per-posting Python loop
cost 2.1 ms/query at just 2k docs and scaled linearly with df.
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
        # term -> {slot: tf} for updates; per-term (slots, tfs) numpy
        # caches for scoring, invalidated per touched term
        self._postings: dict[str, dict] = defaultdict(dict)
        self._term_cache: dict[str, tuple] = {}
        # dense slot table: doc_id <-> slot; a reverse slot->terms map
        # makes upsert/remove O(|doc terms|), not O(vocabulary)
        self._slot_of: dict = {}
        self._doc_ids: list = []
        self._doc_terms: dict[int, tuple] = {}
        self._free: list[int] = []
        self._doc_len = np.zeros(0, np.float32)  # slot-indexed
        self._total_len = 0
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._slot_of)

    def _take_slot(self, doc_id) -> int:
        if self._free:
            slot = self._free.pop()
            self._doc_ids[slot] = doc_id
            return slot
        slot = len(self._doc_ids)
        self._doc_ids.append(doc_id)
        if slot >= len(self._doc_len):
            grown = np.zeros(max(64, 2 * len(self._doc_len)), np.float32)
            grown[: len(self._doc_len)] = self._doc_len
            self._doc_len = grown
        return slot

    def _drop_postings(self, slot: int) -> None:
        for t in self._doc_terms.pop(slot, ()):
            d = self._postings.get(t)
            if d is not None:
                d.pop(slot, None)
                self._term_cache.pop(t, None)
                if not d:
                    del self._postings[t]

    def add(self, doc_id, text: str) -> None:
        toks = tokenize(text)
        with self._lock:
            slot = self._slot_of.get(doc_id)
            if slot is not None:  # upsert
                self._total_len -= float(self._doc_len[slot])
                self._drop_postings(slot)
            else:
                slot = self._take_slot(doc_id)
                self._slot_of[doc_id] = slot
            self._doc_len[slot] = len(toks)
            self._total_len += len(toks)
            tf: dict = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for t, c in tf.items():
                self._postings[t][slot] = c
                self._term_cache.pop(t, None)
            self._doc_terms[slot] = tuple(tf)
        try:
            from longbow_tpu.metrics import get_registry

            get_registry().inc("longbow_bm25_documents_indexed_total")
        except Exception:
            pass  # metrics must never fail an index write

    def remove(self, doc_id) -> None:
        with self._lock:
            slot = self._slot_of.pop(doc_id, None)
            if slot is None:
                return
            self._total_len -= float(self._doc_len[slot])
            self._doc_len[slot] = 0.0
            self._drop_postings(slot)
            self._doc_ids[slot] = None
            self._free.append(slot)

    def _term_arrays(self, t: str):
        cached = self._term_cache.get(t)
        if cached is not None:
            return cached
        d = self._postings.get(t)
        if not d:
            return None
        slots = np.fromiter(d.keys(), np.int64, len(d))
        tfs = np.fromiter(d.values(), np.float32, len(d))
        out = (slots, tfs)
        self._term_cache[t] = out
        return out

    def search(
        self, query: str, k: int, allowed: Optional[set] = None
    ) -> list[tuple]:
        """-> [(doc_id, bm25_score)] best-first. `allowed` restricts
        results (the roaring-bitmap filter path,
        bm25_inverted_index.go:195)."""
        toks = tokenize(query)
        n = len(self._slot_of)
        if n == 0 or not toks:
            return []
        with self._lock:
            avg_len = self._total_len / n
            nslots = len(self._doc_ids)
            scores = np.zeros(nslots, np.float32)
            for t in set(toks):
                arrs = self._term_arrays(t)
                if arrs is None:
                    continue
                slots, tfs = arrs
                df = len(slots)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                dl = self._doc_len[slots]
                denom = tfs + self.k1 * (
                    1 - self.b + self.b * dl / avg_len
                )
                # slots are unique within one term's postings, so the
                # fancy-index add is exact (and much faster than
                # np.add.at's buffered scatter)
                scores[slots] += idf * tfs * (self.k1 + 1) / denom
            if allowed is not None:
                mask = np.zeros(nslots, bool)
                for doc in allowed:
                    s = self._slot_of.get(doc)
                    if s is not None:
                        mask[s] = True
                scores = np.where(mask, scores, 0.0)
            kk = min(k, nslots)
            top = np.argpartition(-scores, kk - 1)[:kk]
            top = top[np.argsort(-scores[top])]
            return [
                (self._doc_ids[s], float(scores[s]))
                for s in top
                if scores[s] > 0.0
            ]

    def export_state(self) -> dict:
        # doc ids ride as [id, value] PAIRS: snapshots pass through
        # json.dumps, which stringifies dict keys — a doc-id-keyed
        # export came back with str ids after recovery, so hybrid
        # fusion never merged sparse hits with dense int ids and
        # re-puts of the original int id left ghost postings forever
        # (the LWW export dodges this the same way, engine.py)
        with self._lock:
            return {
                "k1": self.k1,
                "b": self.b,
                "postings": {
                    t: [
                        [self._doc_ids[s], tf] for s, tf in d.items()
                    ]
                    for t, d in self._postings.items()
                },
                "doc_len": [
                    [doc, float(self._doc_len[s])]
                    for doc, s in self._slot_of.items()
                ],
            }

    @classmethod
    def import_state(cls, st: dict) -> "BM25Index":
        idx = cls(st["k1"], st["b"])
        raw_len = st["doc_len"]
        pairs = (
            raw_len if isinstance(raw_len, list) else raw_len.items()
        )  # legacy dict form (keys already stringified) still loads
        for doc, ln in pairs:
            slot = idx._take_slot(doc)
            idx._slot_of[doc] = slot
            idx._doc_len[slot] = ln
            idx._total_len += ln
        doc_terms: dict[int, list] = defaultdict(list)
        for t, d in st["postings"].items():
            entries = d if isinstance(d, list) else d.items()
            for doc, tf in entries:
                slot = idx._slot_of[doc]
                idx._postings[t][slot] = tf
                doc_terms[slot].append(t)
        idx._doc_terms = {s: tuple(ts) for s, ts in doc_terms.items()}
        return idx

"""Pure-python BM25 oracle — the rank-identity contract.

The reference's scoring is Lucene's default BM25 similarity invoked via
OpenSearch ``multi_match`` (reference: index/Index.java:304-313; the
``text`` field is BM25-analyzed per doc/mappings.txt:41-44):

    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d)  = Σ_t  idf(t) · tfnorm(t, d)          k1 = 1.2, b = 0.75

The reference's Java stack cannot run in this sandbox, so this small,
obviously-correct in-memory implementation — sharing the exact analyzer
chain with the Spark engine — is the stand-in oracle the engine must be
rank-identical to (same scores, same ``(-score, doc_id)`` tie-break).

Filter semantics mirror ``Index.search``: filters are unscored and
restrict the candidate set; the score comes only from the text clause
(reference: index/Index.java:296-313 — ``must`` vs ``filter`` clauses
of the bool query).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field
from typing import Any, Callable

from .analyzer import (analyze, analyze_positions, analyze_query,
                       analyze_query_positions, make_stemmer)

K1 = 1.2
B = 0.75


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tfnorm(tf: int, dl: int, avgdl: float, k1: float = K1,
                b: float = B) -> float:
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


@dataclass
class OracleIndex:
    """In-memory inverted index over (doc_id → text, attrs)."""

    mode: str = "english"
    k1: float = K1
    b: float = B
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    positions: dict[str, dict[int, list[int]]] = field(
        default_factory=dict)
    doc_len: dict[int, int] = field(default_factory=dict)
    attrs: dict[int, dict[str, Any]] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        if not self.doc_len:
            return 0.0
        return sum(self.doc_len.values()) / len(self.doc_len)

    def add(self, doc_id: int, text: str | None,
            attrs: dict[str, Any] | None = None) -> None:
        stemmer = make_stemmer(self.mode)
        pairs = analyze_positions(text, mode=self.mode, _stemmer=stemmer)
        counts = Counter(t for t, _ in pairs)
        self.doc_len[doc_id] = len(pairs)
        self.attrs[doc_id] = attrs or {}
        for term, tf in counts.items():
            self.postings.setdefault(term, {})[doc_id] = tf
        for term, pos in pairs:
            self.positions.setdefault(term, {}).setdefault(
                doc_id, []).append(pos)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def search(self, query_text: str, k: int = 10,
               predicate: Callable[[dict[str, Any]], bool] | None = None,
               ) -> list[tuple[int, float]]:
        """Disjunctive (OR) BM25 top-k, matching Lucene ``multi_match``
        default semantics; ties broken by ascending doc_id.

        Query analysis uses the same chain as indexing; duplicate query
        terms are deduplicated (Lucene scores each unique term once per
        BooleanQuery clause deduplication).
        """
        q_terms = sorted(set(analyze_query(query_text, mode=self.mode)))
        if not q_terms or not self.doc_len:
            return []
        n, avgdl = self.n_docs, self.avgdl
        scores: dict[int, float] = {}
        # Per-doc term contributions summed in sorted-term order —
        # deterministic float64 reduction, mirrored by the engine.
        for term in q_terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = bm25_idf(n, len(plist))
            for doc_id, tf in plist.items():
                contrib = idf * bm25_tfnorm(tf, self.doc_len[doc_id],
                                            avgdl, self.k1, self.b)
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        items = [
            (doc_id, s) for doc_id, s in scores.items()
            if predicate is None or predicate(self.attrs[doc_id])
        ]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]

    def search_phrase(self, query_text: str, k: int = 10,
                      predicate: Callable[[dict[str, Any]], bool]
                      | None = None) -> list[tuple[int, float]]:
        """Exact-phrase BM25 top-k — the Lucene PhraseQuery contract:
        the analyzed phrase keeps raw-stream positions (stopword gaps
        preserved), a document matches where every slot's term occurs
        at the slot's relative offset, tf = the exact number of such
        anchor positions, idf = Σ idf over the DISTINCT phrase terms
        (sorted-term summation, mirrored bit-for-bit by the engine)."""
        slots = analyze_query_positions(query_text, mode=self.mode)
        if not slots or not self.doc_len:
            return []
        terms = sorted({t for t, _ in slots})
        if any(not self.positions.get(t) for t in terms):
            return []
        sum_idf = 0.0
        for t in terms:
            sum_idf += bm25_idf(self.n_docs, self.df(t))
        cand = set(self.positions[terms[0]])
        for t in terms[1:]:
            cand &= set(self.positions[t])
        items: list[tuple[int, float]] = []
        for doc_id in cand:
            if predicate is not None and not predicate(
                    self.attrs[doc_id]):
                continue
            t0, q0 = slots[0]
            anchors = {p - q0 for p in self.positions[t0][doc_id]}
            for t, q in slots[1:]:
                anchors &= {p - q for p in self.positions[t][doc_id]}
                if not anchors:
                    break
            ptf = len(anchors)
            if ptf:
                items.append((doc_id, sum_idf * bm25_tfnorm(
                    ptf, self.doc_len[doc_id], self.avgdl,
                    self.k1, self.b)))
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]


def build_oracle(rows: list[dict[str, Any]], *, text_col: str = "text",
                 doc_id_col: str = "doc_id",
                 mode: str = "english") -> OracleIndex:
    """Build an OracleIndex from a list of row dicts."""
    idx = OracleIndex(mode=mode)
    for row in rows:
        attrs = {c: v for c, v in row.items() if c not in (text_col,)}
        idx.add(row[doc_id_col], row.get(text_col), attrs)
    return idx

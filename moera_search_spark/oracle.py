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
                      | None = None,
                      slop: int = 0) -> list[tuple[int, float]]:
        """Phrase BM25 top-k — the Lucene PhraseQuery contract: the
        analyzed phrase keeps raw-stream positions (stopword gaps
        preserved).  Exact (``slop=0``): a document matches where
        every slot's term occurs at the slot's relative offset, tf =
        the number of such anchors.  Sloppy (``slop>0``, distinct
        terms only): the classic SloppyPhraseScorer sweep —
        implemented here independently of the engine's
        ``_sloppy_sweep`` so the fuzz parity is a real cross-check —
        with tf = Σ 1/(1 + matchLength) over the windows it scores.
        idf = Σ idf over the DISTINCT phrase terms (sorted-term
        summation, mirrored bit-for-bit by the engine)."""
        slots = analyze_query_positions(query_text, mode=self.mode)
        if not slots or not self.doc_len:
            return []
        terms = sorted({t for t, _ in slots})
        if len(slots) <= 1:
            slop = 0
        elif slop > 0 and len(terms) < len(slots):
            raise NotImplementedError(
                "sloppy matching of repeated-term phrases")
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
            if slop > 0:
                tf: float = self._sloppy_freq(
                    [[p - q for p in self.positions[t][doc_id]]
                     for t, q in slots], slop)
            else:
                t0, q0 = slots[0]
                anchors = {p - q0 for p in self.positions[t0][doc_id]}
                for t, q in slots[1:]:
                    anchors &= {p - q
                                for p in self.positions[t][doc_id]}
                    if not anchors:
                        break
                tf = len(anchors)
            if tf:
                items.append((doc_id, sum_idf * bm25_tfnorm(
                    tf, self.doc_len[doc_id], self.avgdl,
                    self.k1, self.b)))
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]

    @staticmethod
    def _sloppy_freq(pos_lists: list[list[int]], slop: int) -> float:
        """The classic Lucene sloppy sweep over per-slot ADJUSTED
        position lists (ascending, all non-empty), written plainly:
        keep one cursor per slot; repeatedly take the slot whose
        current position is smallest (ties: slot order), advance it
        through every position ≤ the smallest position among the
        OTHER slots, and score a match when the historical max
        position minus the last position so reached is ≤ slop,
        weighted 1/(1+that); stop when a slot exhausts (its last
        window still scores)."""
        cursors = [0] * len(pos_lists)
        end = max(lst[0] for lst in pos_lists)
        freq = 0.0
        while True:
            i = min(range(len(pos_lists)),
                    key=lambda j: (pos_lists[j][cursors[j]], j))
            others_min = min(pos_lists[j][cursors[j]]
                             for j in range(len(pos_lists)) if j != i)
            lst = pos_lists[i]
            c = cursors[i]
            start = lst[c]
            done = False
            while lst[c] <= others_min:
                start = lst[c]
                c += 1
                if c >= len(lst):
                    done = True
                    break
            cursors[i] = min(c, len(lst) - 1)
            match_length = end - start
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            if done:
                return freq
            end = max(end, lst[c])


def build_oracle(rows: list[dict[str, Any]], *, text_col: str = "text",
                 doc_id_col: str = "doc_id",
                 mode: str = "english") -> OracleIndex:
    """Build an OracleIndex from a list of row dicts."""
    idx = OracleIndex(mode=mode)
    for row in rows:
        attrs = {c: v for c, v in row.items() if c not in (text_col,)}
        idx.add(row[doc_id_col], row.get(text_col), attrs)
    return idx

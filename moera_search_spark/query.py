"""Top-k BM25 retrieval over the built index.

The Spark restatement of the reference's search path (reference:
rest/SearchEntriesController.java:123-181 → index/Index.java:278-410
builds a bool query with one scored ``multi_match`` clause plus
unscored ``filter`` clauses; Lucene executes BM25 with block-max WAND
skipping and returns ranked doc ids; the controller then hydrates them
via EntryRepository.findDocuments, EntryRepository.java:209-290):

    analyze(query) → idf from term_stats → postings(term ∈ q) with
    parquet min-max pruning → decode + score (Arrow) → unscored filter
    semi-join → deterministic top-k → optional hydration join to docs

Two scoring strategies, both rank-identical to the oracle:

* ``exhaustive`` — decode every matching posting block, score, top-k.
  One job; the baseline and the filter-heavy path.
* ``pruned`` — block-max pruning at chunk granularity (the BMW
  analogue, expressed in DataFrame algebra): per chunk an admissible
  upper bound Σ_t max(idf_t · max_tfnorm) is computed WITHOUT decoding
  any block; the top-bounded chunks are scored exhaustively to obtain a
  threshold θ (the running kth score of WAND), then every chunk whose
  bound < θ is pruned.  Docs in pruned chunks score ≤ bound < θ, so the
  final top-k is provably unchanged.

Determinism: per-doc scores are float64 sums of per-term contributions
accumulated in sorted-term order (per-term pivot columns folded
left-to-right — see ``_score``), matching the oracle's reduction order
exactly; ties broken by ascending doc_id (the reference's rank order is
likewise deterministic for equal scores — Lucene breaks ties by doc id).

Filter semantics preserved from the reference: filters never contribute
to the score (Index.java:296-313 ``must`` vs ``filter``); with filters
present, θ is computed from *filtered* seed scores so pruning stays
admissible for the filtered top-k.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from . import manifest as mf
from .analyzer import analyze_query
from .oracle import bm25_idf

DECODED_SCHEMA = "term string, doc_id long, contrib double"

PHRASE_SCHEMA = "doc_id long, ptf long, score double"


def _sloppy_sweep(pos_lists, slop: int) -> tuple[float, int]:
    """Sloppy-phrase frequency for ONE document — the classic Lucene
    sweep (SloppyPhraseScorer.phraseFreq, Lucene 3.x/4.x; the modern
    SloppyPhraseMatcher keeps the same contract for phrases without
    repeated terms): a priority queue of per-slot ADJUSTED positions
    (document position − query offset, ties broken by query offset
    order), initialized with ``end = max`` of the first positions;
    repeatedly pop the minimum slot, advance it through every
    position ≤ the new queue top (tracking ``start`` = the last such
    position), and score a match when ``matchLength = end − start ≤
    slop`` with weight ``1/(1 + matchLength)`` (DefaultSimilarity
    sloppyFreq); ``end`` only grows.  The sweep ends when any slot
    exhausts — its final window still scores, as in Lucene.

    ``pos_lists``: one ascending int array per slot (ALL non-empty;
    callers pre-filter conjunctively).  Returns (sloppy_freq,
    n_matches).  Inherently sequential per document — the same
    per-doc loop shape Lucene runs; distribution happens across
    (term, chunk) partitions, not inside the sweep."""
    import heapq

    ptrs = [0] * len(pos_lists)
    heap = [(int(arr[0]), i) for i, arr in enumerate(pos_lists)]
    heapq.heapify(heap)
    end = max(p for p, _ in heap)
    freq = 0.0
    n_matches = 0
    while True:
        pos, i = heapq.heappop(heap)
        arr = pos_lists[i]
        nxt = heap[0][0]
        start = pos
        done = False
        p = ptrs[i]
        cur = int(arr[p])
        while cur <= nxt:
            start = cur
            p += 1
            if p >= len(arr):
                done = True
                break
            cur = int(arr[p])
        ptrs[i] = p
        match_length = end - start
        if match_length <= slop:
            freq += 1.0 / (1.0 + match_length)
            n_matches += 1
        if done:
            break
        if cur > end:
            end = cur
        heapq.heappush(heap, (cur, i))
    return freq, n_matches


def _check_k_page(k: int, page: int) -> None:
    """Shared serving-contract check (ADVICE r4): a k < 1 or negative
    page silently yields an empty/odd slice, masking caller bugs."""
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    if page < 0:
        raise ValueError(f"page must be >= 0; got {page}")


def _phrase_match_iter(slots: list[tuple[str, int]], sum_idf: float,
                       avgdl: float, k1: float, b: float,
                       slop: int = 0):
    """mapInPandas body for exact-phrase matching over positional runs.

    Input: ``positions``-table rows repartitioned by chunk and sorted
    ``(chunk, term, first_doc_id)`` within partitions; a chunk's rows
    may span Arrow batches, so the worker buffers the open chunk
    (runs never span chunks, so a chunk is a complete matching unit).

    Per chunk: decode doc gaps / tfs / position deltas vectorized,
    intersect candidate docs across the distinct phrase terms, then
    intersect POSITION KEYS — slot ``i`` (term t_i at query position
    q_i) contributes keys ``(local_doc << 33) | (pos − q_i + Q)``; an
    exact phrase occurrence is one key present in EVERY slot's set, so
    the per-doc count of the final intersection is the exact phrase
    frequency (repeated terms and stopword position gaps are handled
    by construction — each slot is an independent constraint).

    Scoring is Lucene's PhraseQuery contract: BM25 with
    tf = phrase frequency and idf = Σ idf(t) over the distinct terms
    (summed in sorted-term order, matching the oracle bit-for-bit).
    """
    from .postings import vb_decode

    qmax = max(q for _, q in slots)
    terms = sorted({t for t, _ in slots})

    def fn(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[pd.DataFrame] = []
        open_chunk = -1

        def flush() -> pd.DataFrame | None:
            if not buf:
                return None
            pdf = pd.concat(buf) if len(buf) > 1 else buf[0]
            per_term: dict[str, tuple] = {}
            for t, grp in pdf.groupby("term", sort=False):
                docs_l, tfs_l, pos_l = [], [], []
                for first, dblob, tblob, pblob in zip(
                        grp["first_doc_id"].values,
                        grp["deltas"].values, grp["tfs"].values,
                        grp["pdeltas"].values):
                    # first gap is 0 relative to first_doc_id
                    docs_l.append(np.cumsum(vb_decode(dblob)) + first)
                    tfs_l.append(vb_decode(tblob))
                    pos_l.append(vb_decode(pblob))
                # runs of one term have disjoint ascending doc ranges
                # and arrive sorted by first_doc_id → concatenation is
                # globally doc-ascending
                d = np.concatenate(docs_l)
                tf = np.concatenate(tfs_l)
                pflat = np.concatenate(pos_l)
                dl = np.concatenate([vb_decode(x)
                                     for x in grp["dls"].values]) \
                    if t == terms[0] else None
                per_term[t] = (d, tf, pflat, dl)
            if any(t not in per_term for t in terms):
                return None
            cand = per_term[terms[0]][0]
            for t in terms[1:]:
                cand = np.intersect1d(cand, per_term[t][0],
                                      assume_unique=True)
            if cand.size == 0:
                return None
            if slop > 0:
                # sloppy matching (classic Lucene sweep, one doc at a
                # time — see _sloppy_sweep): per-slot ADJUSTED
                # position lists per candidate doc, conjunctive
                # pre-filter already applied via cand.  tf =
                # sloppyFreq (Σ 1/(1+matchLength)); ptf reports the
                # match-window count.
                slot_data = []
                for t, q in slots:
                    d, tf, pflat, _ = per_term[t]
                    offs = np.concatenate(([0], np.cumsum(tf)))
                    cs = np.cumsum(pflat)
                    seg_base = cs[offs[:-1]] - pflat[offs[:-1]]
                    abs_pos = cs - np.repeat(seg_base, tf)
                    sel = np.searchsorted(d, cand)
                    slot_data.append((offs, abs_pos, sel, q))
                freqs = np.zeros(cand.size)
                nmatch = np.zeros(cand.size, np.int64)
                for ci in range(cand.size):
                    lists = [ap[offs[sel[ci]]:offs[sel[ci] + 1]] - q
                             for offs, ap, sel, q in slot_data]
                    freqs[ci], nmatch[ci] = _sloppy_sweep(lists, slop)
                keep = freqs > 0.0
                if not keep.any():
                    return None
                hit_docs = cand[keep]
                sfreq = freqs[keep]
                d0, _, _, dl0 = per_term[terms[0]]
                dls = dl0[np.searchsorted(d0, hit_docs)]
                norm = sfreq / (sfreq + k1 * (1.0 - b
                                              + b * dls / avgdl))
                return pd.DataFrame(
                    {"doc_id": hit_docs.astype("int64"),
                     "ptf": nmatch[keep],
                     "score": sum_idf * norm})
            base = int(cand[0])
            keys = None
            for t, q in slots:
                d, tf, pflat, _ = per_term[t]
                # absolute positions: segmented cumsum of the per-doc
                # delta stream (first delta of a doc is absolute)
                offs = np.concatenate(([0], np.cumsum(tf)))
                cs = np.cumsum(pflat)
                seg_base = cs[offs[:-1]] - pflat[offs[:-1]]
                abs_pos = cs - np.repeat(seg_base, tf)
                sel = np.searchsorted(d, cand)
                mask = np.zeros(d.size, dtype=bool)
                mask[sel] = True
                row_mask = np.repeat(mask, tf)
                dd = np.repeat(d, tf)[row_mask]
                pp = abs_pos[row_mask]
                kk = ((dd - base) << 33) + (pp - q + qmax)
                keys = kk if keys is None else \
                    np.intersect1d(keys, kk, assume_unique=True)
                if keys.size == 0:
                    return None
            hit_docs, ptf = np.unique((keys >> 33) + base,
                                      return_counts=True)
            d0, _, _, dl0 = per_term[terms[0]]
            dls = dl0[np.searchsorted(d0, hit_docs)]
            norm = ptf / (ptf + k1 * (1.0 - b + b * dls / avgdl))
            return pd.DataFrame(
                {"doc_id": hit_docs.astype("int64"),
                 "ptf": ptf.astype("int64"),
                 "score": sum_idf * norm})

        for pdf in pdf_iter:
            n = len(pdf)
            if n == 0:
                continue
            chunks = pdf["chunk"].values
            bnd = np.flatnonzero(np.concatenate(
                ([True], chunks[1:] != chunks[:-1])))
            ends = np.append(bnd[1:], n)
            for s, e in zip(bnd, ends):
                ch = int(chunks[s])
                if ch != open_chunk:
                    out = flush()
                    buf.clear()
                    if out is not None:
                        yield out
                    open_chunk = ch
                buf.append(pdf.iloc[s:e])
        out = flush()
        if out is not None:
            yield out

    return fn


def _decode_score_iter(idf: dict[str, float], avgdl: float, k1: float,
                       b: float):
    """mapInPandas body: posting-block rows → (term, doc_id, contrib).

    One vectorized pass per Arrow batch (``decode_blocks_batch``) — the
    round-1 per-block python loop paid ~100 µs dispatch per block,
    ~1 s on a 6k-block query."""

    def fn(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .postings import decode_blocks_batch, tfnorm

        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            counts = pdf["n_docs"].values.astype(np.int64)
            doc_ids, tf, dl = decode_blocks_batch(
                pdf["first_doc_id"].values, counts,
                list(pdf["deltas"].values), list(pdf["tfs"].values),
                list(pdf["dls"].values))
            idf_per_block = pdf["term"].map(idf).values.astype(np.float64)
            contrib = np.repeat(idf_per_block, counts) \
                * tfnorm(tf, dl, avgdl, k1, b)
            yield pd.DataFrame({
                "term": np.repeat(pdf["term"].values, counts),
                "doc_id": doc_ids,
                "contrib": contrib,
            })

    return fn


class FTSIndex:
    """Handle over a built index directory (docs/postings/stats tables)."""

    def __init__(self, spark, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        config = mf.load_config(index_dir)
        if config is None:
            raise FileNotFoundError(f"no build config at {index_dir}")
        if config.get("pending_merge"):
            raise RuntimeError(
                f"index at {index_dir} has an interrupted segment merge "
                "— run moera_search_spark.incremental.recover(index_dir) "
                "(or merge_segments, which recovers first) before "
                "opening it")
        self.config = config
        self.mode = config["mode"]
        self.k1 = float(config["k1"])
        self.b = float(config["b"])
        self.chunk_size = int(config["chunk_size"])
        self.n_term_buckets = int(config.get("n_term_buckets", 16))
        if "corpus" in config:
            # committed with the config save (the crash-atomic source
            # of truth); the corpus_stats parquet is a derived cache
            self.n_docs = int(config["corpus"]["n_docs"])
            total_dl = int(config["corpus"]["total_dl"])
            self.avgdl = (total_dl / self.n_docs) if self.n_docs else 0.0
        else:
            corpus = pd.read_parquet(
                os.path.join(index_dir, "corpus_stats")).iloc[0]
            self.n_docs = int(corpus["n_docs"])
            self.avgdl = float(corpus["avgdl"])
        self._docs_df = None
        self._postings_df = None
        self._positions_df = None
        self._tomb_df: object = False   # False = not yet resolved
        # Point-query path: AQE's shuffle-stage materialize-and-replan
        # round trips cost ~200 ms per query on this path's small,
        # bounded stages and buy nothing (partition counts are already
        # right-sized).  The prior session value is saved and restored
        # by ``close()`` (FTSIndex is a context manager), so opening an
        # index does not silently strip AQE from unrelated workloads in
        # the same session; builds also re-enable it explicitly.
        try:
            self._prior_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        except Exception:
            self._prior_aqe = "true"
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    def close(self) -> None:
        """Release the per-index session footprint: restore the AQE
        setting the constructor overrode and drop the pruned path's
        cached seed generation."""
        prev = getattr(self, "_seed_cache", None)
        if prev is not None:
            prev.unpersist(False)
            self._seed_cache = None
        self.spark.conf.set("spark.sql.adaptive.enabled",
                            self._prior_aqe)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # Table handles are memoized per instance: spark.read.parquet pays
    # a file-listing round (hundreds of ms on object storage) that a
    # per-query path must not repeat.  The contract is Lucene's
    # point-in-time reader: an FTSIndex sees the index as of open();
    # reopen after external updates (every caller already does).

    @property
    def docs(self):
        if self._docs_df is None:
            self._docs_df = self.spark.read.parquet(
                os.path.join(self.index_dir, "docs"))
        return self._docs_df

    @property
    def postings(self):
        if self._postings_df is None:
            self._postings_df = self.spark.read.parquet(
                os.path.join(self.index_dir, "postings"))
        return self._postings_df

    @property
    def term_stats(self):
        return self.spark.read.parquet(
            os.path.join(self.index_dir, "term_stats"))

    @property
    def positions(self):
        """Positional postings (present only when the index was built
        with ``positions=True``)."""
        if self._positions_df is None:
            self._positions_df = self.spark.read.parquet(
                os.path.join(self.index_dir, "positions"))
        return self._positions_df

    @property
    def tombstones(self):
        """Tombstoned doc_ids (None when the index has no deletes)."""
        from .incremental import _tombstones_df

        if self._tomb_df is False:
            self._tomb_df = _tombstones_df(self.spark, self.index_dir)
        return self._tomb_df

    @property
    def live_docs(self):
        """Docs minus tombstones — the user-visible document set (the
        per-turn row-invariant view after updates)."""
        tomb = self.tombstones
        return self.docs if tomb is None else \
            self.docs.join(tomb, "doc_id", "left_anti")

    # -- query pieces -------------------------------------------------

    def query_terms(self, query_text: str) -> list[str]:
        """Analyzed query terms.  Under ``bilingual`` mode this routes
        the query to ONE language twin field (detect → analyze with
        that chain → ``en>``/``ru>`` namespace), the reference's
        query-language field routing (LanguageAnalyzer.java:42-48)."""
        return sorted(set(analyze_query(query_text, mode=self.mode)))

    def idf_map(self, q_terms: list[str]) -> dict[str, float]:
        """df lookup for the (tiny) query term set → Lucene idf.

        Driver-side pyarrow predicate read: term_stats files are
        term-sorted within partitions, so the row-group min-max stats
        skip everything but the groups containing the query terms — no
        Spark job for a point lookup (the analogue of the reference's
        in-process term-dictionary access inside Lucene)."""
        if not q_terms:
            return {}
        import pyarrow.dataset as pads

        dset = pads.dataset(os.path.join(self.index_dir, "term_stats"))
        tbl = dset.to_table(filter=pads.field("term").isin(q_terms),
                            columns=["term", "df"])
        # df is summed across rows: delta segments append their own
        # (term, df) rows (incremental.py), and — like Lucene before a
        # merge — df is not decremented for tombstoned docs.
        dfs: dict[str, int] = {}
        for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
            dfs[t] = dfs.get(t, 0) + int(d)
        return {t: bm25_idf(self.n_docs, d) for t, d in dfs.items()}

    def _postings_for(self, matched: list[str]):
        """Posting rows for the query terms: the term_bucket predicate
        prunes whole directory shards (partition pruning — a T-term
        query touches ≤ T of the index's term_bucket dirs), then the
        term predicate pushes into parquet row-group min-max stats."""
        from pyspark.sql import functions as F

        from .build import term_bucket

        buckets = sorted({term_bucket(t, self.n_term_buckets)
                          for t in matched})
        return (self.postings
                .filter(F.col("term_bucket").isin(buckets))
                .filter(F.col("term").isin(matched)))

    def _filter_pred(self, filters: dict | None):
        from pyspark.sql import functions as F

        if not filters:
            return None
        pred = F.lit(True)
        if "role" in filters:
            pred = pred & (F.col("role") == filters["role"])
        if "tool" in filters:
            pred = pred & (F.col("tool") == filters["tool"])
        if "ts_min" in filters:
            pred = pred & (F.col("ts") >= F.lit(filters["ts_min"]))
        if "ts_max" in filters:
            pred = pred & (F.col("ts") <= F.lit(filters["ts_max"]))
        return pred

    def _score(self, postings_sel, idf: dict[str, float], filters):
        """Decode + score + deterministic per-doc reduction (+ filter).

        The reduction pivots per-term contributions into one column per
        (sorted) query term — each (doc, term) decodes to exactly one
        row, so ``sum(when(term=t))`` is that value — then folds the
        columns left-to-right in sorted-term order.  Bit-identical to
        the oracle's sorted-term accumulation (x + 0.0 == x exactly for
        finite IEEE doubles, so coalescing absent terms to 0.0 matches
        the oracle skipping them), and, unlike the round-1
        ``array_sort(collect_list(struct))`` plan, it partial-aggregates
        MAP-SIDE: the shuffle carries one T+1-column row per doc
        instead of one struct per decoded posting (~df(term) rows per
        term) — the difference between shuffling MBs and GBs on a
        head-term query at corpus scale."""
        from pyspark.sql import functions as F

        decoded = postings_sel.mapInPandas(
            _decode_score_iter(idf, self.avgdl, self.k1, self.b),
            DECODED_SCHEMA)
        terms_sorted = sorted(idf)
        aggs = [F.sum(F.when(F.col("term") == t, F.col("contrib")))
                .alias(f"_c{i}") for i, t in enumerate(terms_sorted)]
        per_doc = decoded.groupBy("doc_id").agg(*aggs)
        score = F.lit(0.0)
        for i in range(len(terms_sorted)):
            score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
        scored = per_doc.select("doc_id", score.alias("score"))
        tomb = self.tombstones
        if tomb is not None:
            # live-docs mask: tombstoned (replaced/deleted) docs still
            # have postings until compaction, but can never surface
            scored = scored.join(tomb, "doc_id", "left_anti")
        pred = self._filter_pred(filters)
        if pred is not None:
            allowed = self.docs.filter(pred).select("doc_id")
            scored = scored.join(allowed, "doc_id", "left_semi")
        return scored

    # -- public entry points -------------------------------------------

    # Measured strategy crossover (BASELINE.md round 2) for indexes
    # WITHOUT the pc_bounds sidecar: below ~2M live docs one exhaustive
    # action beats pruning's two; above it the refined block-max prune
    # reads a shrinking fraction of the corpus.  Sidecar-carrying
    # indexes don't need the static crossover — the pruned path gates
    # itself per query from the driver-side bounds (PRUNE_MIN_FRACTION)
    # and degrades to the single exhaustive action when pruning can't
    # pay, so ``auto`` just routes to it.
    AUTO_PRUNE_MIN_DOCS = 2_000_000

    # search_many pivot granularity: docs per dense (docs × |union|)
    # block inside the doc-partition Arrow pass — caps the DENSE PIVOT
    # buffer at 8·BLOCK·|union| bytes.  The narrow row arrays
    # themselves still scale with the partition's share of the match
    # set (~20 B/row over matchset/shuffle_partitions rows — that IS
    # the narrow-shuffle contract; size shuffle_partitions to the
    # corpus).  Class attr so tests can shrink it to cover the
    # multi-block path.
    SEARCH_MANY_DOC_BLOCK = 1 << 18
    # FILTERED query sets route to the per-query-union strategy above
    # this corpus size (search_many method='auto'): the batched
    # narrow-shuffle path leads at ≤9.7M turns (2.08× at 3.9M, 1.15×
    # at 9.7M) but the fmask rows + per-query candidate growth erode
    # the shared-scan gain — measured 0.79× vs sequential-exhaustive
    # at 19.4M and 0.91× vs sequential-pruned at 38.9M (BASELINE.md
    # round-5 size points).  Unfiltered sets stay batched (lead at
    # every measured size).  Class attr so tests and deployments can
    # move the crossover.
    SEARCH_MANY_FILTERED_SEQ_MIN_DOCS = 15_000_000

    def search(self, query_text: str, k: int = 10,
               filters: dict | None = None, method: str = "auto",
               hydrate: bool = False, page: int = 0):
        """Top-k BM25. Returns DataFrame (doc_id, score) rank-ordered,
        or hydrated doc rows when ``hydrate``.

        ``method``: ``'auto'`` picks the strategy by corpus size (the
        engine analogue of Lucene only engaging WAND when it pays),
        ``'exhaustive'`` / ``'pruned'`` force one.

        ``page`` gives the reference's from/size pagination
        (from = page·limit, size = limit — Index.java:397-398, limits
        defaulted/capped by SearchEntriesController.java:38-39): rank
        the top (page+1)·k and slice the last k."""
        from pyspark.sql import functions as F

        _check_k_page(k, page)
        if method == "auto":
            if ("pc_granularity" in self.config and os.path.isdir(
                    os.path.join(self.index_dir, "pc_bounds"))):
                method = "pruned"   # self-gating, see AUTO note above
            else:
                method = ("pruned"
                          if self.n_docs >= self.AUTO_PRUNE_MIN_DOCS
                          else "exhaustive")
        q_terms = self.query_terms(query_text)
        idf = self.idf_map(q_terms)
        matched = [t for t in q_terms if t in idf]
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not matched:
            result = empty
        else:
            depth = (page + 1) * k
            postings_sel = self._postings_for(matched)
            if method == "exhaustive":
                scored = self._score(postings_sel, idf, filters)
            elif method == "pruned":
                scored = self._pruned_scored(postings_sel, idf, filters,
                                             depth)
            else:
                raise ValueError(f"unknown method {method}")
            ranked = scored.orderBy(F.desc("score"), F.asc("doc_id"))
            result = (ranked.offset(page * k).limit(k) if page > 0
                      else ranked.limit(depth))
        if hydrate:
            # broadcast the k winners into the docs table (the analogue
            # of fetch-ids-then-hydrate, EntryRepository.findDocuments)
            result = (self.docs.join(F.broadcast(result), "doc_id")
                      .orderBy(F.desc("score"), F.asc("doc_id")))
        return result

    def search_phrase(self, query_text: str, k: int = 10,
                      filters: dict | None = None, slop: int = 0,
                      hydrate: bool = False, page: int = 0):
        """Exact-phrase top-k over the positional index — the
        ``match_phrase`` capability of the engine the reference
        delegates text search to (OpenSearch/Lucene PhraseQuery; the
        result carries ``(doc_id, ptf, score)`` where ptf is the exact
        phrase frequency — Lucene's ``freq`` as surfaced by explain —
        so serving layers and the cross-engine gate can verify it; the
        reference's own API stops at ``multi_match``, Index.java:304-313,
        so this is a scale-added serving shape like ``search_many``).

        Semantics are Lucene's: the phrase is analyzed with the index
        chain keeping positions, stopword removal leaves gaps
        (``enablePositionIncrements``) that the document must
        reproduce exactly; the score is BM25 with tf = exact phrase
        frequency and idf = Σ idf over the distinct phrase terms,
        normalized by the document length.  A one-term phrase
        degenerates to the equivalent term query (Lucene's own
        PhraseQuery rewrite, regardless of slop).  Filters never
        score, as everywhere.

        ``slop > 0`` (round 5) runs the classic Lucene sloppy sweep
        (``_sloppy_sweep`` — the documented SloppyPhraseScorer
        contract: min-advance over the adjusted-position queue, each
        match weighted ``1/(1 + matchLength)``; tf = that
        sloppyFreq, ``ptf`` reports the match-window count) for
        phrases WITHOUT repeated terms.  A repeated-term sloppy
        phrase raises NotImplementedError: Lucene's repeat-collision
        machinery (termPositionsDiffer / repeat groups) is a
        distinct algorithm whose semantics we will not approximate
        silently — an honest error beats a subtly different ranking.

        Requires ``build_index(..., positions=True)``.
        """
        from pyspark.sql import functions as F

        from .analyzer import analyze_query_positions
        from .build import term_bucket

        _check_k_page(k, page)
        if slop < 0:
            raise ValueError(f"slop must be >= 0; got {slop}")
        if not bool(self.config.get("positions", False)):
            raise ValueError(
                "index was built without positions=True — rebuild with "
                "positions=True, or run compact(..., positions=True) "
                "to add phrase support from the live docs")
        slots = analyze_query_positions(query_text, mode=self.mode)
        empty = self.spark.createDataFrame([], PHRASE_SCHEMA)
        terms = sorted({t for t, _ in slots})
        if len(slots) <= 1:
            slop = 0   # 1-term phrase ≡ term query at any slop
        elif slop > 0 and len(terms) < len(slots):
            raise NotImplementedError(
                "sloppy matching of phrases with REPEATED terms is "
                "not implemented (Lucene's repeat-collision "
                "machinery); exact matching (slop=0) supports "
                "repeats")
        idf = self.idf_map(terms)
        if not slots or any(t not in idf for t in terms):
            # phrase matching is conjunctive: any absent term ⇒ no doc
            # can contain the phrase
            result = empty
        else:
            sum_idf = 0.0
            for t in terms:   # sorted order — matches the oracle
                sum_idf += idf[t]
            buckets = sorted({term_bucket(t, self.n_term_buckets)
                              for t in terms})
            rows = (self.positions
                    .filter(F.col("term_bucket").isin(buckets))
                    .filter(F.col("term").isin(terms))
                    .withColumn("chunk",
                                (F.col("first_doc_id") / self.chunk_size)
                                .cast("long")))
            # co-locate every term's runs of one doc-range chunk in one
            # task: runs never span chunks, so a chunk is a complete,
            # bounded matching unit (≤ chunk_size docs per term) — the
            # phrase analogue of the (term, chunk) skew strategy: a
            # stopword-adjacent phrase spreads over all tasks instead
            # of melting one
            n_parts = self.spark.sparkContext.defaultParallelism
            scored = (rows.repartition(n_parts, "chunk")
                      .sortWithinPartitions("chunk", "term",
                                            "first_doc_id")
                      .mapInPandas(
                          _phrase_match_iter(slots, sum_idf,
                                             self.avgdl, self.k1,
                                             self.b, slop=slop),
                          PHRASE_SCHEMA))
            tomb = self.tombstones
            if tomb is not None:
                scored = scored.join(tomb, "doc_id", "left_anti")
            pred = self._filter_pred(filters)
            if pred is not None:
                allowed = self.docs.filter(pred).select("doc_id")
                scored = scored.join(allowed, "doc_id", "left_semi")
            ranked = scored.orderBy(F.desc("score"), F.asc("doc_id"))
            depth = (page + 1) * k
            result = (ranked.offset(page * k).limit(k) if page > 0
                      else ranked.limit(depth))
        if hydrate:
            result = (self.docs.join(F.broadcast(result), "doc_id")
                      .orderBy(F.desc("score"), F.asc("doc_id")))
        return result

    # Driver-side sidecar ceiling: above this many (term, pc) rows the
    # per-query pyarrow read stops being a point lookup (a head term
    # over a 10^12-doc corpus has ~10^9 pseudo-chunks) and the
    # distributed bounds plan takes over.
    SIDECAR_MAX_ROWS = 5_000_000
    # Above this many surviving pseudo-chunks pruning isn't buying
    # anything — score everything (rank-identical by definition).
    SURVIVING_MAX_PCS = 100_000
    # Prunability gate (sidecar path): once the exact θ is known
    # driver-side, pruning must remove at least this fraction of
    # pseudo-chunks for the block-selection machinery to beat a plain
    # exhaustive pass over the query-term blocks; below it, run
    # exhaustive (rank-identical by definition).  Tests force the
    # machinery by setting the attribute negative on the instance.
    PRUNE_MIN_FRACTION = 0.1
    # Driver-side tombstone read ceiling for the seed-θ pass (bytes);
    # a delete-heavier index falls back to the distributed path.
    TOMBSTONE_READ_MAX = 64 * 1024 * 1024

    def _pruned_scored(self, postings_sel, idf: dict[str, float],
                       filters, k: int, seed_chunks: int = 32,
                       granularity: int | None = None):
        """Block-range-refined block-max pruning (the BMW analogue).

        Dispatcher: when the index carries the build-time ``pc_bounds``
        sidecar at the requested granularity (and the query's bound
        rows fit a driver read), seed selection and pruning decisions
        come from ONE pyarrow metadata scan — the same point-lookup
        shape as ``idf_map`` — and the two Spark actions shrink to
        pure decode+score passes over range-predicate-selected blocks
        (VERDICT round 2 item 5).  Otherwise the fully distributed
        bounds plan below runs (``_pruned_scored_dynamic``) — the
        scale path when the driver read would be too large."""
        G = granularity or max(64, self.chunk_size // 32)
        if ("pc_granularity" in self.config
                and G == int(self.config["pc_granularity"])):
            pdf = self._pc_bounds_pdf(sorted(idf))
            if pdf is not None:
                return self._pruned_scored_sidecar(
                    postings_sel, idf, filters, k, seed_chunks, G, pdf)
        return self._pruned_scored_dynamic(
            postings_sel, idf, filters, k, seed_chunks, G)

    def _pc_bounds_pdf(self, terms: list[str]):
        """(term, pc, mtf) rows for the query terms from the sidecar,
        or None when the sidecar is absent (pre-round-3 index, or a
        base index whose config predates the sidecar) or the row count
        exceeds the driver ceiling.  term_bucket partition dirs prune
        the listing; the term predicate pushes into row-group min-max
        stats (rows are term-sorted within files)."""
        path = os.path.join(self.index_dir, "pc_bounds")
        if not terms or not os.path.isdir(path):
            return None
        import pyarrow.dataset as pads

        from .build import term_bucket

        buckets = sorted({term_bucket(t, self.n_term_buckets)
                          for t in terms})
        try:
            dset = pads.dataset(path, partitioning="hive")
            tbl = dset.to_table(
                filter=(pads.field("term").isin(terms)
                        & pads.field("term_bucket").isin(buckets)),
                columns=["term", "pc", "mtf"])
        except Exception:
            return None
        if tbl.num_rows > self.SIDECAR_MAX_ROWS:
            return None
        return tbl.to_pandas()

    @staticmethod
    def _pc_intervals(pcs) -> list[tuple[int, int]]:
        """Sorted pc list → merged [lo, hi] runs (inclusive)."""
        out: list[tuple[int, int]] = []
        for p in pcs:
            p = int(p)
            if out and p == out[-1][1] + 1:
                out[-1] = (out[-1][0], p)
            else:
                out.append((p, p))
        return out

    def _select_pcs(self, blocks_or_scored, pcs, G: int, kind: str):
        """Restrict a plan to a pc set.

        ``docs``: doc_id's own pc ∈ set — an ``isin`` over the (≤ a few
        thousand) pc literals compiles to one InSet probe; larger sets
        go through a broadcast semi-join.  ``blocks``: range overlap is
        not an equality, so membership goes through the pc
        sequence-explode + broadcast semi-join (the span is ≤
        chunk_size/G pcs per block).  Deep OR-of-range predicates are
        deliberately avoided: Catalyst's constraint propagation is
        super-linear in OR fan-out and a ~100-branch predicate costs
        seconds of DRIVER planning per action (measured)."""
        from pyspark.sql import functions as F

        if kind == "docs":
            pc_col = (F.col("doc_id") / G).cast("long")
            if len(pcs) <= 4096:
                return blocks_or_scored.filter(
                    pc_col.isin([int(p) for p in pcs]))
            pcs_df = F.broadcast(self.spark.createDataFrame(
                [(int(p),) for p in pcs], "pc long"))
            return (blocks_or_scored.withColumn("pc", pc_col)
                    .join(pcs_df, "pc", "left_semi").drop("pc"))
        intervals = self._pc_intervals(pcs)
        if len(intervals) <= 8:
            # few contiguous runs → a small range predicate, no join
            pred = None
            for lo, hi in intervals:
                p = ((F.col("first_doc_id") <= (hi + 1) * G - 1)
                     & (F.col("last_doc_id") >= lo * G))
                pred = p if pred is None else (pred | p)
            return blocks_or_scored.filter(pred)
        pcs_df = F.broadcast(self.spark.createDataFrame(
            [(int(p),) for p in pcs], "pc long"))
        keyed = blocks_or_scored.withColumn("pc", F.explode(
            F.sequence((F.col("first_doc_id") / G).cast("long"),
                       (F.col("last_doc_id") / G).cast("long"))))
        return (keyed.join(pcs_df, "pc", "left_semi")
                .dropDuplicates(["term", "first_doc_id"]).drop("pc"))

    def _pruned_scored_sidecar(self, postings_sel, idf, filters,
                               k: int, seed_chunks: int, G: int, pdf):
        """Sidecar-driven pruning with a DRIVER-SIDE seed pass — ONE
        Spark action total.

        The seed blocks are bounded by construction (``seed_chunks``
        pcs × query terms × a handful of blocks each), so the θ pass
        doesn't need a cluster: the driver reads exactly those block
        rows with a pyarrow predicate scan and scores them with the
        same numpy decode the executors use (``_driver_seed_theta``,
        bit-parity fold, minus a 1e-9 slack for cross-path float
        safety).  Surviving pcs = {bound ≥ θ} are then known BEFORE
        any job, and Spark runs a single decode+score pass over the
        surviving blocks — the BMW two-action floor drops to one.

        Admissibility of the single pass: every true top-k doc's own
        pc survives (its bound ≥ its full score ≥ θ), and a doc whose
        own pc survives is FULLY scored (each of its term blocks
        overlaps that pc).  With all idf ≥ 0, a straddle doc from a
        pruned pc can only surface with partial ≤ full ≤ its own
        bound < θ — it cannot displace the top-k, so no dedup or
        filter is needed.  With any negative idf (partial can exceed
        full) the result is restricted to docs whose own pc survives —
        the strict regime pinned by tests/test_round3_fixes.py.

        Fallbacks: oversized tombstones or unreadable metadata →
        ``_pruned_scored_dynamic`` (fully distributed); weak pruning
        (< PRUNE_MIN_FRACTION of pcs removed) or an oversized
        surviving set → plain exhaustive, rank-identical by
        definition.
        """
        decision = self._sidecar_surviving(idf, filters, k,
                                           seed_chunks, G, pdf)
        if decision[0] == "empty":
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        if decision[0] == "theta_none":
            return self._pruned_scored_dynamic(
                postings_sel, idf, filters, k, seed_chunks, G)
        if decision[0] == "all":
            return self._score(postings_sel, idf, filters)
        _, surviving, strict = decision
        blocks = self._select_pcs(postings_sel, surviving, G, "blocks")
        scored = self._score(blocks, idf, filters)
        if strict:
            scored = self._select_pcs(scored, surviving, G, "docs")
        return scored

    def _select_term_pcs(self, blocks, pairs_pdf, G: int):
        """Per-TERM pc-overlap block selection for the batched pruned
        path (``search_many``): ``pairs_pdf`` holds the (term, pc)
        scan units, and a block of term t is kept iff its doc range
        overlaps one of t's OWN pcs — the same pc-sequence explode +
        broadcast semi-join as ``_select_pcs(kind='blocks')`` but
        keyed on both columns, so no term scans another query's
        surviving pcs."""
        from pyspark.sql import functions as F

        pairs = F.broadcast(self.spark.createDataFrame(
            pairs_pdf.astype({"pc": "int64"})))
        keyed = blocks.withColumn("pc", F.explode(
            F.sequence((F.col("first_doc_id") / G).cast("long"),
                       (F.col("last_doc_id") / G).cast("long"))))
        return (keyed.join(pairs, ["term", "pc"], "left_semi")
                .dropDuplicates(["term", "first_doc_id"]).drop("pc"))

    def _seed_context(self) -> dict:
        """Shared driver-side read handles for a BATCH of seed-θ
        folds (``search_many``): postings dataset discovery and the
        tombstone doc_id read happen once instead of once per query.
        Built per call — never cached on the instance — so a new
        index generation can't be served stale handles."""
        import pyarrow.dataset as pads

        from .incremental import TOMBSTONES

        ctx: dict = {"tomb": None}
        try:
            ctx["dset"] = pads.dataset(
                os.path.join(self.index_dir, "postings"),
                partitioning="hive")
        except Exception:
            ctx["dset"] = None
        tomb_dir = os.path.join(self.index_dir, TOMBSTONES)
        if os.path.isdir(tomb_dir):
            files = [os.path.join(tomb_dir, f)
                     for f in os.listdir(tomb_dir)
                     if f.endswith(".parquet")]
            if sum(os.path.getsize(f) for f in files) \
                    > self.TOMBSTONE_READ_MAX:
                ctx["tomb"] = "oversized"
            elif files:
                ctx["tomb"] = pads.dataset(files).to_table(
                    columns=["doc_id"])["doc_id"].to_numpy()
        return ctx

    def _sidecar_surviving(self, idf, filters, k: int,
                           seed_chunks: int, G: int, pdf, ctx=None):
        """The driver-side pruning DECISION of the sidecar path,
        factored out so the single-query (``_pruned_scored_sidecar``)
        and batched (``search_many``) paths share it verbatim.

        Given the query's idf map and its ``pc_bounds`` rows, returns
        one of::

            ("empty",)                    no bound rows → no matches
            ("theta_none",)               seed-θ pass signalled
                                          fallback (oversized
                                          tombstones / unreadable
                                          metadata)
            ("all",)                      pruning too weak to pay, or
                                          surviving set oversized →
                                          score everything
            ("pruned", surviving, strict) sorted surviving pc list +
                                          the negative-idf strict flag
        """
        import numpy as np

        strict = any(v < 0 for v in idf.values())
        min_enc = float(self.config.get("min_encode_avgdl", self.avgdl)
                        or self.avgdl)
        factor = max(1.0, self.avgdl / min_enc) if min_enc > 0 else 1.0
        # delta segments append their own (term, pc) rows → max first
        agg = pdf.groupby(["term", "pc"], as_index=False)["mtf"].max()
        idf_arr = agg["term"].map(idf).to_numpy(dtype=np.float64)
        ub = np.maximum(idf_arr * agg["mtf"].to_numpy(dtype=np.float64)
                        * factor, 0.0)
        bounds = (pd.DataFrame({"pc": agg["pc"].to_numpy(), "ub": ub})
                  .groupby("pc")["ub"].sum())
        order = bounds.reset_index().sort_values(
            ["ub", "pc"], ascending=[False, True], kind="mergesort")
        seed_pcs = sorted(int(p) for p in
                          order["pc"].head(seed_chunks).to_numpy())
        if not seed_pcs:
            return ("empty",)
        # single-query callers pass no ctx — build the same shared
        # handle set a batch uses, so ONE code path owns the dataset
        # discovery and the TOMBSTONE_READ_MAX policy
        if ctx is None:
            ctx = self._seed_context()
        theta = self._driver_seed_theta(sorted(idf), idf, filters,
                                        seed_pcs, G, k, ctx=ctx)
        if theta is None:
            return ("theta_none",)
        if np.isfinite(theta):
            theta -= 1e-9          # cross-path float-parity slack
        surviving = sorted(int(p) for p, bnd in bounds.items()
                           if bnd >= theta)
        pruned_frac = 1.0 - len(surviving) / max(len(bounds), 1)
        if pruned_frac < self.PRUNE_MIN_FRACTION \
                or len(surviving) > self.SURVIVING_MAX_PCS:
            return ("all",)
        return ("pruned", surviving, strict)

    def _driver_seed_theta(self, matched, idf, filters, seed_pcs,
                           G: int, k: int, ctx: dict):
        """Exact θ (kth best true score among live, filter-passing
        docs whose own pc is a seed) computed entirely on the driver.

        Reads only the blocks overlapping the seed pcs (pyarrow range
        predicate over the term_bucket-pruned postings dirs), decodes
        them with the SAME vectorized codec the executors run, and
        reduces per doc in sorted-term order (left-to-right, float64)
        — the engine's bit-parity fold.  θ over a subset of true
        filtered scores is ≤ the true filtered kth score:
        admissible.  Returns −inf when fewer than k docs qualify
        (pruning then keeps every pc with bound ≥ −inf, i.e. none is
        dropped), or None to signal fallback (tombstones above the
        driver read ceiling, unreadable metadata)."""
        import numpy as np
        import pyarrow.dataset as pads

        from .build import term_bucket
        from .postings import decode_blocks_batch, tfnorm

        intervals = self._pc_intervals(seed_pcs)
        buckets = sorted({term_bucket(t, self.n_term_buckets)
                          for t in matched})
        ov = None
        for lo, hi in intervals:
            p = ((pads.field("first_doc_id") <= (hi + 1) * G - 1)
                 & (pads.field("last_doc_id") >= lo * G))
            ov = p if ov is None else (ov | p)
        try:
            dset = ctx["dset"]         # shared handle (_seed_context)
            if dset is None:
                return None            # discovery failed once, for all
            tbl = dset.to_table(
                filter=(pads.field("term").isin(matched)
                        & pads.field("term_bucket").isin(buckets) & ov),
                columns=["term", "first_doc_id", "n_docs", "deltas",
                         "tfs", "dls"])
        except Exception:
            return None
        if tbl.num_rows == 0:
            return float("-inf")
        bpdf = tbl.to_pandas()
        counts = bpdf["n_docs"].to_numpy(np.int64)
        doc_ids, tf, dl = decode_blocks_batch(
            bpdf["first_doc_id"].to_numpy(np.int64), counts,
            list(bpdf["deltas"]), list(bpdf["tfs"]), list(bpdf["dls"]))
        contrib = np.repeat(
            bpdf["term"].map(idf).to_numpy(np.float64), counts) \
            * tfnorm(tf, dl, self.avgdl, self.k1, self.b)
        terms_rep = np.repeat(bpdf["term"].to_numpy(), counts)
        own = np.isin(doc_ids // G, np.asarray(seed_pcs, np.int64))
        doc_ids, contrib, terms_rep = \
            doc_ids[own], contrib[own], terms_rep[own]
        if doc_ids.size == 0:
            return float("-inf")
        # live-docs mask (tombstones): read once per ctx, size-gated
        # by _seed_context (the only copy of TOMBSTONE_READ_MAX)
        tomb = ctx["tomb"]
        if isinstance(tomb, str):      # "oversized"
            return None
        if tomb is not None:
            keep = ~np.isin(doc_ids, tomb)
            doc_ids, contrib, terms_rep = \
                doc_ids[keep], contrib[keep], terms_rep[keep]
        if filters and doc_ids.size:
            allowed = self._driver_filter_docs(filters, intervals, G)
            if allowed is None:
                return None
            keep = np.isin(doc_ids, allowed)
            doc_ids, contrib, terms_rep = \
                doc_ids[keep], contrib[keep], terms_rep[keep]
        if doc_ids.size == 0:
            return float("-inf")
        order = np.lexsort((terms_rep, doc_ids))
        d_s, c_s = doc_ids[order], contrib[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        scores = np.add.reduceat(c_s, starts)
        if scores.size < k:
            return float("-inf")
        top = np.lexsort((d_s[starts], -scores))
        return float(scores[top[k - 1]])

    def _driver_filter_docs(self, filters, intervals, G: int):
        """doc_ids inside the seed intervals passing the unscored
        filters — a pyarrow read of the docs metadata columns (docs
        files are doc_id-monotone, so the range predicate prunes row
        groups).  Session time zone is UTC (the repo contract), so
        naive timestamp comparison matches the Spark predicate."""
        import numpy as np
        import pyarrow.dataset as pads

        ov = None
        for lo, hi in intervals:
            p = ((pads.field("doc_id") >= lo * G)
                 & (pads.field("doc_id") <= (hi + 1) * G - 1))
            ov = p if ov is None else (ov | p)
        try:
            tbl = pads.dataset(
                os.path.join(self.index_dir, "docs")).to_table(
                filter=ov, columns=["doc_id", "role", "tool", "ts"])
        except Exception:
            return None
        dpdf = tbl.to_pandas()
        m = np.ones(len(dpdf), dtype=bool)
        if "role" in filters:
            m &= (dpdf["role"] == filters["role"]).to_numpy()
        if "tool" in filters:
            m &= (dpdf["tool"] == filters["tool"]).to_numpy()
        if "ts_min" in filters or "ts_max" in filters:
            ts = pd.to_datetime(dpdf["ts"])
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)

            def naive_utc(v):
                t = pd.Timestamp(v)
                return t.tz_convert("UTC").tz_localize(None) \
                    if t.tzinfo is not None else t

            if "ts_min" in filters:
                m &= (ts >= naive_utc(filters["ts_min"])).to_numpy()
            if "ts_max" in filters:
                m &= (ts <= naive_utc(filters["ts_max"])).to_numpy()
        return dpdf["doc_id"].to_numpy()[m]

    def _pruned_scored_dynamic(self, postings_sel, idf: dict[str, float],
                               filters, k: int, seed_chunks: int,
                               G: int):
        """Block-range-refined block-max pruning (the BMW analogue).

        Bounds are computed at *pseudo-chunk* granularity ``G``
        (default chunk_size/32 = 256 docs), MUCH finer than the encode
        chunk: every block row carries (first_doc_id, last_doc_id,
        max_tfnorm), so each block's upper bound is spread over the
        pseudo-chunks its doc range overlaps (a metadata-only
        sequence-explode — no decode).  At 8192-doc granularity the
        summed per-term maxima almost never drop below θ on multi-term
        queries (measured: 0% prunable chunks on the 3.9M reference
        set); at 256 docs the same queries prune 65–96% of the corpus.

        Admissibility: a doc d in pseudo-chunk p has, per term t, its
        single t-block containing d overlap p, so contribution(t, d) ≤
        max(ub over t-blocks overlapping p) and score(d) ≤ bound(p).

        Two driver actions (the BMW floor — θ must reach the driver
        before the rest pass can prune):

        1. seed pass — top ``seed_chunks`` pseudo-chunks by bound
           (broadcast subplan, no extra round-trip) are decoded and
           scored; its top-k sets θ.
        2. rest pass — blocks overlapping any surviving pseudo-chunk
           (bound ≥ θ, non-seed) are decoded and merged with the seed
           scores.  Docs in pruned pseudo-chunks score ≤ bound < θ ≤
           true kth score and cannot displace the top-k.

        Admissibility regimes (same split as the sidecar path — see
        ``_pruned_scored_sidecar``): with all idf ≥ 0 a straddling
        doc's partial score is ≤ its full score, so the θ pool keeps
        straddle docs and the merge max-dedups per doc; with any
        negative idf both passes restrict to docs whose own pc they
        cover (full scores only, disjoint plain union).
        """
        from pyspark.sql import functions as F

        idf_expr = F.create_map(
            *[x for t, v in idf.items() for x in (F.lit(t), F.lit(v))])
        # Admissibility under incremental updates: stored max_tfnorm was
        # computed with the encoding segment's avgdl; tfnorm is
        # increasing in avgdl, so scaling by avgdl_now/min_encode_avgdl
        # (when > 1) keeps every bound a true upper bound.
        # idf can go NEGATIVE under delta semantics (N is live and
        # decremented on delete, df is segment-summed and not — so
        # df > N after deleting most docs containing a term, and
        # (N+1)/(df+0.5) < 1).  A negative idf times max_tfnorm is a
        # LOWER bound; the admissible per-term bound is then 0
        # (a doc missing the term contributes exactly 0, one
        # containing it contributes idf·tfnorm < 0), so clamp.
        min_enc = float(self.config.get("min_encode_avgdl", self.avgdl)
                        or self.avgdl)
        factor = max(1.0, self.avgdl / min_enc) if min_enc > 0 else 1.0
        cand = postings_sel.withColumn("ub", F.greatest(
            idf_expr[F.col("term")] * F.col("max_tfnorm")
            * F.lit(factor), F.lit(0.0)))
        # block → overlapped pseudo-chunks (span ≤ chunk_size/G since
        # blocks never cross an encode chunk)
        exploded = cand.withColumn("pc", F.explode(F.sequence(
            (F.col("first_doc_id") / G).cast("long"),
            (F.col("last_doc_id") / G).cast("long"))))
        bounds = (exploded.groupBy("pc", "term")
                  .agg(F.max("ub").alias("tub"))
                  .groupBy("pc").agg(F.sum("tub").alias("bound")))
        seed_sel = (bounds.orderBy(F.desc("bound"), F.asc("pc"))
                    .limit(seed_chunks).select("pc"))
        block_key = ["term", "first_doc_id"]
        seed_blocks = (exploded
                       .join(F.broadcast(seed_sel), "pc", "left_semi")
                       .dropDuplicates(block_key).drop("pc"))
        strict = any(v < 0 for v in idf.values())

        def _own_pc(scored, pcs):
            """Restrict to docs whose own pseudo-chunk is in ``pcs`` —
            exactly the docs the pass scored FULLY (strict regime)."""
            return (scored
                    .withColumn("pc", (F.col("doc_id") / G).cast("long"))
                    .join(F.broadcast(pcs), "pc", "left_semi")
                    .drop("pc"))

        # Cached: the θ collect materializes it, the final union reuses
        # it (small: one (doc_id, score) row per seed-pc doc).  One
        # cached generation per index — the previous query's seed cache
        # is dropped here so repeated queries don't accumulate blocks.
        prev = getattr(self, "_seed_cache", None)
        if prev is not None:
            prev.unpersist(False)
        seed_scored = self._score(seed_blocks, idf, filters)
        if strict:
            seed_scored = _own_pc(seed_scored, seed_sel)
        seed_scored = seed_scored.persist()
        self._seed_cache = seed_scored
        seed_topk = (seed_scored
                     .orderBy(F.desc("score"), F.asc("doc_id"))
                     .limit(k).collect())                  # action 1
        theta = float(seed_topk[-1]["score"]) \
            if len(seed_topk) >= k else float("-inf")
        surviving = (bounds.join(seed_sel, "pc", "left_anti")
                     .filter(F.col("bound") >= F.lit(theta))
                     .select("pc"))
        rest_blocks = (exploded
                       .join(F.broadcast(surviving), "pc", "left_semi")
                       .dropDuplicates(block_key).drop("pc"))
        rest_scored = self._score(rest_blocks, idf, filters)
        if strict:
            # each side carries only full scores of disjoint pc sets —
            # plain union, no dedup
            rest_scored = _own_pc(rest_scored, surviving)
            return seed_scored.unionByName(rest_scored)
        return (seed_scored.unionByName(rest_scored)
                .groupBy("doc_id").agg(F.max("score").alias("score")))

    def search_conversations(self, query_text: str, k: int = 10,
                             agg: str = "max",
                             filters: dict | None = None,
                             method: str = "exhaustive"):
        """Conversation-level top-k: aggregate turn scores per conv_id
        (``max`` = best-turn ranking, Lucene best_fields flavor;
        ``sum`` = total-evidence).  The analogue of the reference's
        ALL entry type folding comments into their parent posting
        (EntryRepository.java:172-181 CASE over the optional hop)."""
        from pyspark.sql import functions as F

        q_terms = self.query_terms(query_text)
        idf = self.idf_map(q_terms)
        matched = [t for t in q_terms if t in idf]
        if not matched:
            return self.spark.createDataFrame(
                [], "conv_id string, score double, n_turns long")
        scored = self._score(self._postings_for(matched), idf, filters)
        agg_fn = {"max": F.max, "sum": F.sum}[agg]
        per_conv = (scored
                    .join(self.docs.select("doc_id", "conv_id"), "doc_id")
                    .groupBy("conv_id")
                    .agg(agg_fn("score").alias("score"),
                         F.count("*").alias("n_turns")))
        return (per_conv.orderBy(F.desc("score"), F.asc("conv_id"))
                .limit(k))

    def _fmask_plan(self, filt_q):
        """Per-query filters → one per-doc bitmask plan, shared by
        ``search_many`` and ``match_count_many``: each DISTINCT
        filter set becomes one bit computed in a single expression
        pass over the docs table (never one join per query).

        Returns ``(q_bit, mask_df, all_filtered)``: ``q_bit[qi]`` is
        query qi's bit index (None = unfiltered), ``mask_df`` a
        (doc_id, fmask) DataFrame holding only docs that pass ≥1
        filter (None when no query is filtered), and ``all_filtered``
        whether every query carries a filter (callers may then
        inner-join, pruning no-filter docs before any shuffle)."""
        from pyspark.sql import functions as F

        preds = [self._filter_pred(f) for f in filt_q]
        uniq_bits: dict[str, int] = {}
        bit_preds: list = []
        q_bit: list[int | None] = [None] * len(filt_q)
        for qi, (f, p) in enumerate(zip(filt_q, preds)):
            if p is None:
                continue
            key = repr(sorted(f.items()))
            j = uniq_bits.setdefault(key, len(bit_preds))
            if j == len(bit_preds):
                bit_preds.append(p)
            q_bit[qi] = j
        if len(bit_preds) > 62:
            raise ValueError("more than 62 distinct filter sets in "
                             "one batch — split the query set")
        if not bit_preds:
            return q_bit, None, False
        fmask_expr = None
        for j, p in enumerate(bit_preds):
            term_ = F.when(p, F.lit(1 << j)).otherwise(F.lit(0))
            fmask_expr = term_ if fmask_expr is None \
                else fmask_expr + term_     # bits disjoint
        mask_df = (self.docs
                   .select("doc_id",
                           fmask_expr.cast("long").alias("fmask"))
                   .filter(F.col("fmask") > 0))
        return q_bit, mask_df, all(p is not None for p in preds)

    def search_many(self, query_texts: list[str],
                    k: int | list[int] = 10,
                    filters: dict | None | list = None,
                    method: str = "auto", hydrate: bool = False,
                    page: int | list[int] = 0):
        """Batched top-k BM25: Q queries answered by ONE Spark job that
        shares a single postings scan + decode + per-doc pivot (the
        serving shape for the reference query SET — Q sequential
        ``search()`` calls pay Q× job scheduling and Q× postings scans;
        at 10^12 docs the scan dominates, so batching approaches Q×
        cheaper).  Returns (query_id, doc_id, score) where query_id is
        the position in ``query_texts``; each query's rows are rank-
        and bit-identical to ``search(..., method='exhaustive')`` with
        that query's ``k`` and ``filters``.

        ``k``, ``filters`` and ``page`` are per-query when given as
        lists (one entry per query; ``None`` = unfiltered) — the real
        serving shape, where every query of the set carries its own
        page, page size and visibility filters.  Scalars broadcast to
        all queries.  ``page`` is the reference's from/size
        pagination exactly as in ``search()``: rank the top
        (page+1)·k per query, slice that query's last k.
        Per-query filters ride the narrow shuffle as ONE extra row
        per filter-passing doc (``tid = ncols + fmask`` — the term
        rows stay ~20 B): each distinct filter set becomes a bit of a
        per-doc ``fmask`` computed in a single pass over the docs
        table (docs passing no filter are dropped before the shuffle
        when every query is filtered; ≤62 DISTINCT sets per job, a
        larger batch auto-chunks into sub-batches), and each query's
        candidate mask ANDs its bit — filters never score, exactly as
        in ``search()``.

        ``method='per-query'`` (and the ``'auto'`` pick for FILTERED
        sets at ≥ ``SEARCH_MANY_FILTERED_SEQ_MIN_DOCS`` docs) serves
        the set as a union of per-query ``search()`` plans in one
        DataFrame — the measured winner for filtered sets on large
        corpora, where fmask rows + per-query candidate growth erode
        the shared scan (0.79×/0.91× at 19.4M/38.9M, BASELINE.md).

        ``method='pruned'`` (the ``'auto'`` pick when the build-time
        ``pc_bounds`` sidecar is present) batches the sidecar path
        too: per-query θ and surviving-pc sets come from ONE shared
        sidecar read + Q driver-side seed folds
        (``_sidecar_surviving`` — the exact decision the single-query
        path makes, sharing one dataset/tombstone handle via
        ``_seed_context``), and the one Spark pass selects blocks
        PER TERM — term t scans only the pcs surviving for queries
        that contain t, intersected with t's own pc domain
        (``_select_term_pcs``) — so the batch decodes ≈ the union of
        the per-query pruned scans, not |terms| × |union pcs|.
        Admissibility per query q is the single-path argument
        unchanged: every true top-k doc's own pc survives q's θ, and
        for each of ITS terms t that pc is a (t, pc) domain row, so
        the doc is fully scored; any doc from a pc outside q's
        surviving set scores partial ≤ full ≤ bound < θ_q and cannot
        displace q's top-k — extra blocks other queries pull in are
        harmless.  Negative-idf (strict-regime) queries additionally
        restrict their candidates to docs whose own pc survives,
        mirroring the single path.  A query the sidecar can't prune
        (seed-θ fallback, per-query weak pruning) degrades ONLY
        itself: its terms are scanned in full (plain term filter, no
        pair join) while the other queries keep their pruning; a
        batch-level gate on the total (term, pc) domain dropped falls
        all the way back to the exhaustive batch — rank-identical by
        definition, never worse than the unbatched exhaustive scan.

        Plan shape: union-term postings scan (term_bucket dir pruning
        over the union's buckets; pc-range block selection when
        pruned) → one vectorized decode → NARROW (doc_id, tid,
        contrib) doc-hash shuffle (~20 B/row; a union-wide pivot
        shuffle carried ~8·|union| bytes per doc-row and overtook the
        shared-scan saving at 19.4M turns — 0.84× vs sequential) →
        one Arrow pass per doc partition doing the dense pivot (in
        bounded doc-blocks), per-query fold, and per-partition
        per-query top-k — the kth-score cut happens before any
        per-query shuffle, so no query funnels its full match set
        through one task (the multi-query analogue of
        TakeOrderedAndProject's partial top-k) → exact per-query
        top-k over the ≤ partitions·Q·k survivors.  Per-query score
        folds run in the same sorted-term left-to-right order as
        ``_score``, so doubles agree bit-for-bit with the
        single-query path."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        nq = len(query_texts)
        ks = list(k) if isinstance(k, (list, tuple)) else [k] * nq
        if len(ks) != nq:
            raise ValueError(f"k list has {len(ks)} entries for "
                             f"{nq} queries")
        if isinstance(filters, (list, tuple)):
            filt_q = list(filters)
            if len(filt_q) != nq:
                raise ValueError(f"filters list has {len(filt_q)} "
                                 f"entries for {nq} queries")
        else:
            filt_q = [filters] * nq
        pages = list(page) if isinstance(page, (list, tuple)) \
            else [page] * nq
        if len(pages) != nq:
            raise ValueError(f"page list has {len(pages)} entries "
                             f"for {nq} queries")
        # value checks mirror the list-length checks (ADVICE r4): a
        # k<1 or negative page would silently return an empty/odd
        # slice for that query, masking caller bugs in serving code
        bad_k = [qi for qi, kq in enumerate(ks) if kq < 1]
        if bad_k:
            raise ValueError(f"k must be >= 1 for every query; "
                             f"got k={ks[bad_k[0]]} at query "
                             f"{bad_k[0]}")
        bad_p = [qi for qi, p in enumerate(pages) if p < 0]
        if bad_p:
            raise ValueError(f"page must be >= 0 for every query; "
                             f"got page={pages[bad_p[0]]} at query "
                             f"{bad_p[0]}")

        def _hydrated(result):
            if not hydrate:
                return result
            # ≤ Σ k_q rows — broadcast to the docs scan, exactly the
            # single-query hydrate join (fetch-ids-then-hydrate);
            # applied to EVERY return so the all-OOV / all-empty
            # early exits keep the hydrated schema too
            return (self.docs.join(F.broadcast(result), "doc_id")
                    .orderBy("query_id", F.desc("score"),
                             F.asc("doc_id")))

        # Auto-chunk a batch whose DISTINCT filter sets exceed the 62
        # fmask bits (VERDICT r4 noted the hard error): split into
        # order-preserving sub-batches of <= 62 distinct sets, run
        # each through this same method, and remap the sub-batch
        # query_ids back to the caller's positions.  Per-query
        # results are independent of which batch a query rides in
        # (each is rank- and bit-identical to the single search()),
        # so the union equals the one-batch answer; the cost is one
        # postings scan per sub-batch instead of one total.
        fkeys = [None if f is None else repr(sorted(f.items()))
                 for f in filt_q]
        if len({fk for fk in fkeys if fk is not None}) > 62:
            sub_batches: list[list[int]] = []
            cur: list[int] = []
            cur_keys: set[str] = set()
            for qi in range(nq):
                add = {fkeys[qi]} if fkeys[qi] is not None else set()
                if len(cur_keys | add) > 62:
                    sub_batches.append(cur)
                    cur, cur_keys = [], set()
                cur.append(qi)
                cur_keys |= add
            if cur:
                sub_batches.append(cur)
            parts = []
            for batch in sub_batches:
                sub = self.search_many(
                    [query_texts[i] for i in batch],
                    k=[ks[i] for i in batch],
                    filters=[filt_q[i] for i in batch],
                    method=method, hydrate=False,
                    page=[pages[i] for i in batch])
                remap = F.create_map(*[
                    x for local, qi in enumerate(batch)
                    for x in (F.lit(local), F.lit(qi))])
                parts.append(sub.withColumn(
                    "query_id", remap[F.col("query_id")]))
            out = parts[0]
            for p_ in parts[1:]:
                out = out.unionByName(p_)
            if hydrate:
                return _hydrated(out)
            return out.orderBy("query_id", F.desc("score"),
                               F.asc("doc_id"))
        # from/size pagination: rank the top (page+1)·k per query
        # and slice the last k — the single-query depth rule
        depths = [(p + 1) * kq for p, kq in zip(pages, ks)]

        # Strategy routing (round 5): FILTERED sets on a large corpus
        # serve as a UNION of per-query plans — each branch is
        # literally search()'s plan (rank- and bit-identity
        # inherited), the union is still ONE DataFrame/action for the
        # caller, and the measured crossover is the class attr above.
        # method='per-query' forces it; unfiltered auto sets never
        # route here (batched leads at every measured size).
        if method == "per-query" or (
                method == "auto"
                and any(f is not None for f in filt_q)
                and self.n_docs >= self.SEARCH_MANY_FILTERED_SEQ_MIN_DOCS):
            parts = []
            for qi in range(nq):
                r = self.search(query_texts[qi], k=ks[qi],
                                filters=filt_q[qi], method="auto",
                                page=pages[qi])
                parts.append(r.select(
                    F.lit(qi).cast("int").alias("query_id"),
                    "doc_id", "score"))
            out = parts[0]
            for p_ in parts[1:]:
                out = out.unionByName(p_)
            return _hydrated(out.orderBy("query_id", F.desc("score"),
                                         F.asc("doc_id")))

        per_q = [self.query_terms(q) for q in query_texts]
        idf = self.idf_map(sorted({t for ts in per_q for t in ts}))
        matched_q = [[t for t in ts if t in idf] for ts in per_q]
        union_terms = sorted({t for ts in matched_q for t in ts})
        empty = self.spark.createDataFrame(
            [], "query_id int, doc_id long, score double")
        if not union_terms:
            return _hydrated(empty)
        if method == "auto":
            # batched pruning needs the sidecar (there is no batched
            # dynamic-bounds plan); without it, exhaustive IS the
            # batched strategy
            method = ("pruned" if ("pc_granularity" in self.config
                      and os.path.isdir(os.path.join(
                          self.index_dir, "pc_bounds")))
                      else "exhaustive")
        elif method not in ("exhaustive", "pruned"):
            raise ValueError(
                f"unknown method {method!r} — one of 'auto', "
                "'exhaustive', 'pruned', 'per-query'")
        G = max(64, self.chunk_size // 32)
        restrict_pcs: dict[int, "np.ndarray"] | None = None
        block_pairs = None          # (term, pc) scan units when pruned
        if method == "pruned" and "pc_granularity" in self.config \
                and G == int(self.config["pc_granularity"]):
            pdf = self._pc_bounds_pdf(union_terms)
            if pdf is not None:
                term_pcs: dict[str, set[int]] = {}
                full_terms: set[str] = set()
                restrict: dict[int, list[int]] = {}
                any_matched = False
                ctx = self._seed_context()
                for qi, mq in enumerate(matched_q):
                    if not mq:
                        continue
                    idf_q = {t: idf[t] for t in mq}
                    sub = pdf[pdf["term"].isin(mq)]
                    decision = self._sidecar_surviving(
                        idf_q, filt_q[qi], depths[qi], 32, G, sub,
                        ctx=ctx)
                    if decision[0] == "empty":
                        restrict[qi] = []
                        continue
                    any_matched = True
                    if decision[0] in ("theta_none", "all"):
                        # unprunable query: every one of ITS terms
                        # must be scanned in full for its docs to be
                        # fully scored — but the OTHER queries keep
                        # their pruning
                        full_terms.update(mq)
                    else:
                        _, surviving, strict = decision
                        for t in mq:
                            term_pcs.setdefault(t, set()) \
                                .update(surviving)
                        if strict:
                            restrict[qi] = surviving
                if not any_matched and restrict:
                    # every query matched nothing
                    return _hydrated(empty)
                # a term any unprunable query needs stays full-scan
                for t in full_terms:
                    term_pcs.pop(t, None)
                if term_pcs:
                    # Scan units for the restricted terms: term t's
                    # blocks are selected only over pcs surviving for
                    # a query CONTAINING t, intersected with t's own
                    # pc domain (safe: a doc needing full scoring for
                    # q sits in a surviving pc p and contains t, so
                    # (t, p) is a domain row).  A pc-ONLY union
                    # restriction would make every union term scan
                    # every other query's surviving pcs too —
                    # measured 0.73× vs sequential pruned at 3.9M
                    # docs before this refinement.
                    dom = pdf[["term", "pc"]].drop_duplicates()
                    rdom = dom[dom["term"].isin(term_pcs)]
                    sel = pd.DataFrame({
                        "term": np.repeat(
                            np.array(list(term_pcs), dtype=object),
                            [len(s) for s in term_pcs.values()]),
                        "pc": np.fromiter(
                            (p for s in term_pcs.values() for p in s),
                            dtype=np.int64,
                            count=sum(len(s)
                                      for s in term_pcs.values()))})
                    pairs = rdom.merge(sel, on=["term", "pc"])
                    # batch gate: pruning must drop enough of the
                    # TOTAL union-term block domain to pay for the
                    # pair join, and the broadcast side must stay
                    # bounded (the single-query gates, applied batch-
                    # wide — full-scan terms count as unpruned)
                    pruned_frac = (len(rdom) - len(pairs)) \
                        / max(len(dom), 1)
                    if pruned_frac >= self.PRUNE_MIN_FRACTION \
                            and len(pairs) <= self.SURVIVING_MAX_PCS:
                        block_pairs = pairs
                        restrict_pcs = {
                            qi: np.asarray(s, dtype=np.int64)
                            for qi, s in restrict.items()} or None
                    # gate failed → exhaustive batch; NO restriction
                    # may apply then (exhaustive scores every doc
                    # fully, so dropping docs outside a strict
                    # query's surviving set would be wrong)
        postings_sel = self._postings_for(union_terms)
        if block_pairs is not None:
            restricted_terms = sorted(term_pcs)
            unrestricted = postings_sel.filter(
                ~F.col("term").isin(restricted_terms))
            selected = self._select_term_pcs(
                postings_sel.filter(
                    F.col("term").isin(restricted_terms)),
                block_pairs, G)
            postings_sel = unrestricted.unionByName(selected)
        decoded = postings_sel.mapInPandas(
            _decode_score_iter({t: idf[t] for t in union_terms},
                               self.avgdl, self.k1, self.b),
            DECODED_SCHEMA)
        # NARROW doc-colocation shuffle (round 4): the earlier plan
        # pivoted via groupBy(doc_id).agg(one column per UNION term) —
        # with Q queries the union is ~Q× wider than any one query, so
        # every shuffled doc-row carried ~8·|union| bytes of mostly-
        # null pivot columns and decode partitions are term-major, so
        # map-side partial agg collapsed almost nothing.  Measured at
        # 19.4M turns this pivot shuffle overtook the shared-scan
        # saving (0.84× vs sequential).  Instead shuffle the decoded
        # rows themselves as (doc_id, tid:int, contrib) — ≈20 B/row,
        # never more rows than the wide plan shuffled — and do the
        # pivot + per-query fold + top-k in ONE Arrow pass per
        # doc-hash partition.  Rows of one doc co-locate by the
        # repartition; the dense (docs × union-terms) pivot is built
        # in bounded doc-blocks so the pivot buffer stays
        # O(block · |union|) — the narrow rows themselves are the
        # partition's match-set share (see SEARCH_MANY_DOC_BLOCK).
        col_idx = {t: i for i, t in enumerate(union_terms)}
        ncols = len(union_terms)
        tid_map = F.create_map(*[x for t, i in col_idx.items()
                                 for x in (F.lit(t), F.lit(i))])
        narrow = decoded.select(
            "doc_id",
            tid_map[F.col("term")].cast("long").alias("tid"),
            "contrib")
        tomb = self.tombstones
        if tomb is not None:
            narrow = narrow.join(tomb, "doc_id", "left_anti")

        # Per-query filters as a per-doc bitmask (one pass over the
        # docs table — _fmask_plan); query qi's candidate mask ANDs
        # bit q_bit[qi], and docs passing no filter are pruned before
        # the shuffle when every query is filtered.  The mask rides
        # the SAME narrow shuffle as ONE extra row per passing doc,
        # encoded as tid = ncols + fmask (term tids live in
        # [0, ncols); fmask < 2^62 so the sum fits an int64) — a
        # round-4 left-join instead widened EVERY shuffled row by an
        # int64 in the mixed filtered/unfiltered case (~40% wider,
        # ADVICE r4 #2) and cost a second shuffle of the narrow rows
        # for the join itself.  Mask rows of docs matching no query
        # term (or tombstoned docs) are dropped inside part_topk —
        # they never form pivot rows.
        q_bit, mask_df, all_filtered = self._fmask_plan(filt_q)
        if mask_df is not None:
            if all_filtered:
                # every query is filtered: docs passing no filter can
                # never place — prune their term rows pre-shuffle
                narrow = narrow.join(mask_df.select("doc_id"),
                                     "doc_id", "left_semi")
            mask_rows = mask_df.select(
                "doc_id",
                (F.col("fmask") + F.lit(ncols)).cast("long")
                .alias("tid"),
                F.lit(0.0).alias("contrib"))
            narrow = narrow.unionByName(mask_rows)

        q_cols = [[col_idx[t] for t in sorted(mq)] for mq in matched_q]
        DOC_BLOCK = self.SEARCH_MANY_DOC_BLOCK
        has_fmask = mask_df is not None

        def part_topk(pdf_iter):
            chunks = [p for p in pdf_iter if len(p)]
            if not chunks:
                return
            big = pd.concat(chunks, ignore_index=True) \
                if len(chunks) > 1 else chunks[0]
            docs_all = big["doc_id"].to_numpy(np.int64)
            tids_all = big["tid"].to_numpy(np.int64)
            contrib_all = big["contrib"].to_numpy(np.float64)
            fm_doc = None
            if has_fmask:
                # split out the encoded per-doc mask rows
                # (tid = ncols + fmask) that rode the narrow shuffle
                is_mask = tids_all >= ncols
                mdocs = docs_all[is_mask]
                mvals = tids_all[is_mask] - ncols
                keep = ~is_mask
                docs_all = docs_all[keep]
                tids_all = tids_all[keep]
                contrib_all = contrib_all[keep]
                if docs_all.size == 0:
                    return
            # docs sorted+deduped; doc_idx maps each row to its doc
            udocs, doc_idx = np.unique(docs_all, return_inverse=True)
            if has_fmask:
                # per-doc mask aligned to udocs; mask rows of docs
                # with no term row (filter-passing but non-matching,
                # or tombstoned) drop here
                fm_doc = np.zeros(len(udocs), np.int64)
                pos = np.searchsorted(udocs, mdocs)
                ok = pos < len(udocs)
                ok[ok] = udocs[pos[ok]] == mdocs[ok]
                fm_doc[pos[ok]] = mvals[ok]
            if len(udocs) > DOC_BLOCK:
                # one O(rows log rows) sort lets every block slice a
                # contiguous row range — a per-block boolean mask
                # would re-scan all rows per block, O(rows · blocks)
                order = np.argsort(doc_idx, kind="stable")
                doc_idx = doc_idx[order]
                tids_all = tids_all[order]
                contrib_all = contrib_all[order]
            cand: list[list] = [[] for _ in q_cols]
            for lo in range(0, len(udocs), DOC_BLOCK):
                hi = min(lo + DOC_BLOCK, len(udocs))
                r0, r1 = np.searchsorted(doc_idx, (lo, hi)) \
                    if len(udocs) > DOC_BLOCK else (0, len(doc_idx))
                docs = udocs[lo:hi]
                # each (doc, term) decodes to exactly one row (same
                # invariant _score's pivot states), so plain fancy
                # assignment IS the pivot; absent stays NaN
                cols = np.full((hi - lo, ncols), np.nan)
                cols[doc_idx[r0:r1] - lo, tids_all[r0:r1]] = \
                    contrib_all[r0:r1]
                if fm_doc is not None:
                    fm = fm_doc[lo:hi]
                for qi, idxs in enumerate(q_cols):
                    if not idxs:
                        continue
                    sub = cols[:, idxs]
                    hit = ~np.all(np.isnan(sub), axis=1)
                    if q_bit[qi] is not None:
                        # this query's filter bit (filters never
                        # score — a pure candidate mask)
                        hit &= (fm & (1 << q_bit[qi])) != 0
                    if restrict_pcs is not None \
                            and qi in restrict_pcs:
                        # strict-regime (negative-idf) query: only
                        # docs whose OWN pc survived its θ may place
                        hit &= np.isin(docs // G, restrict_pcs[qi])
                    if not hit.any():
                        continue
                    # same fold as _score: 0.0 + coalesce(c, 0.0) in
                    # sorted-term order — identical IEEE add sequence
                    s = np.zeros(int(hit.sum()))
                    for j in range(sub.shape[1]):
                        s = s + np.nan_to_num(sub[hit, j], nan=0.0)
                    d = docs[hit]
                    top = np.lexsort((d, -s))[:depths[qi]]
                    cand[qi].append((d[top], s[top]))
            out_q, out_d, out_s = [], [], []
            for qi, parts in enumerate(cand):
                if not parts:
                    continue
                d = np.concatenate([p[0] for p in parts])
                s = np.concatenate([p[1] for p in parts])
                top = np.lexsort((d, -s))[:depths[qi]]
                out_q.append(np.full(len(top), qi, dtype=np.int32))
                out_d.append(d[top])
                out_s.append(s[top])
            if out_q:
                yield pd.DataFrame({
                    "query_id": np.concatenate(out_q),
                    "doc_id": np.concatenate(out_d),
                    "score": np.concatenate(out_s)})

        cand = narrow.repartition("doc_id").mapInPandas(
            part_topk, "query_id int, doc_id long, score double")
        depth_map = F.create_map(*[x for qi, d in enumerate(depths)
                                   for x in (F.lit(qi), F.lit(d))])
        from_map = F.create_map(*[
            x for qi, (p, kq) in enumerate(zip(pages, ks))
            for x in (F.lit(qi), F.lit(p * kq))])
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id"))
        qid = F.col("query_id")
        return _hydrated(
            cand.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") > from_map[qid])
                    & (F.col("_rn") <= depth_map[qid]))
            .drop("_rn")
            .orderBy("query_id", F.desc("score"), F.asc("doc_id")))

    def match_count(self, query_text: str,
                    filters: dict | None = None) -> int:
        """Total-hits analogue (reference returns total with each page)."""
        from pyspark.sql import functions as F

        q_terms = self.query_terms(query_text)
        idf = self.idf_map(q_terms)
        matched = [t for t in q_terms if t in idf]
        if not matched:
            return 0
        scored = self._score(self._postings_for(matched), idf, filters)
        return scored.count()

    def match_count_many(self, query_texts: list[str],
                         filters: dict | None | list = None):
        """Batched total-hits: one job counts every query of the set
        (the count-first short-circuit the reference serves with each
        page, SearchNodesController.java:252-257, over a query SET).
        Returns (query_id, n_matches) with a row for EVERY query —
        0 for no-match queries — equal per query to ``match_count``
        with that query's ``filters`` (scalar broadcasts; list is
        per-query like ``search_many``).

        Entirely JVM-side — no Arrow pass after the decode: each
        union term maps to a bitmask of the queries containing it
        (``create_map``; one job serves ≤62 queries — the int64 mask
        width — and larger sets auto-chunk into consecutive ≤62-query
        sub-batches, one postings scan each), docs fold their
        term-bitmasks with ``bit_or`` under one doc-hash partial agg
        (narrow rows: doc_id + one long), per-query filter bits come
        from the same one-pass ``fmask`` scheme as ``search_many``,
        and one final map-side-combined aggregate emits every count —
        a query set over a 10^12-doc corpus costs one postings scan +
        one doc-rollup shuffle + one scalar reduce, regardless of Q."""
        from pyspark.sql import functions as F

        nq = len(query_texts)
        if isinstance(filters, (list, tuple)):
            filt_q = list(filters)
            if len(filt_q) != nq:
                raise ValueError(f"filters list has {len(filt_q)} "
                                 f"entries for {nq} queries")
        else:
            filt_q = [filters] * nq
        if nq > 62:
            # auto-chunk: the per-term query bitmask is an int64, so
            # one job counts <= 62 queries; larger sets split into
            # consecutive 62-query sub-batches (each then also has
            # <= 62 distinct filter sets) whose query_ids remap to
            # the caller's positions — per-query counts are
            # independent of batching, so the union is exact
            parts = []
            for lo in range(0, nq, 62):
                hi = min(lo + 62, nq)
                sub = self.match_count_many(
                    query_texts[lo:hi], filters=filt_q[lo:hi])
                parts.append(sub.withColumn(
                    "query_id",
                    (F.col("query_id") + F.lit(lo)).cast("int")))
            out = parts[0]
            for p_ in parts[1:]:
                out = out.unionByName(p_)
            return out

        per_q = [self.query_terms(q) for q in query_texts]
        idf = self.idf_map(sorted({t for ts in per_q for t in ts}))
        matched_q = [[t for t in ts if t in idf] for ts in per_q]
        union_terms = sorted({t for ts in matched_q for t in ts})
        if not union_terms:
            return self.spark.createDataFrame(
                [(qi, 0) for qi in range(nq)],
                "query_id int, n_matches long")

        term_qmask = {t: 0 for t in union_terms}
        for qi, mq in enumerate(matched_q):
            for t in mq:
                term_qmask[t] |= 1 << qi
        qmask_map = F.create_map(*[x for t, m in term_qmask.items()
                                   for x in (F.lit(t), F.lit(m))])
        decoded = self._postings_for(union_terms).mapInPandas(
            _decode_score_iter({t: idf[t] for t in union_terms},
                               self.avgdl, self.k1, self.b),
            DECODED_SCHEMA)
        rows = decoded.select(
            "doc_id", qmask_map[F.col("term")].alias("qm"))
        tomb = self.tombstones
        if tomb is not None:
            rows = rows.join(tomb, "doc_id", "left_anti")
        per_doc = rows.groupBy("doc_id").agg(F.bit_or("qm").alias("qm"))

        # per-doc filter bits (the shared one-pass _fmask_plan)
        q_bit, mask_df, all_filtered = self._fmask_plan(filt_q)
        if mask_df is not None:
            if all_filtered:
                per_doc = per_doc.join(mask_df, "doc_id", "inner")
            else:
                per_doc = (per_doc.join(mask_df, "doc_id", "left")
                           .select("doc_id", "qm",
                                   F.coalesce("fmask", F.lit(0))
                                   .alias("fmask")))

        aggs = []
        for qi in range(nq):
            hit = F.shiftright(F.col("qm"), qi).bitwiseAND(F.lit(1))
            if q_bit[qi] is not None:
                ok = (F.shiftright(F.col("fmask"), q_bit[qi])
                      .bitwiseAND(F.lit(1)))
                hit = hit * ok
            aggs.append(F.coalesce(F.sum(hit), F.lit(0))
                        .cast("long").alias(f"_n{qi}"))
        one = per_doc.agg(*aggs)
        stack = ", ".join(f"{qi}, _n{qi}" for qi in range(nq))
        return one.select(F.expr(
            f"stack({nq}, {stack}) as (query_id, n_matches)"))

"""End-to-end rank-identity: built index vs pure-python BM25 oracle on
the reference query set (the BASELINE.json correctness contract), plus
the per-turn text-equality row invariant and corpus stats checks."""

from __future__ import annotations

import pytest

from moera_search_spark.fixtures import (
    filters_predicate,
    reference_query_set,
)

QUERIES = reference_query_set()


@pytest.fixture(scope="module")
def docs_pdf(built_index):
    return built_index.docs.orderBy("doc_id").toPandas()


class TestRowInvariant:
    def test_doc_ids_dense_and_sorted(self, docs_pdf):
        assert list(docs_pdf["doc_id"]) == list(range(len(docs_pdf)))
        key = list(zip(docs_pdf["conv_id"], docs_pdf["turn_idx"]))
        assert key == sorted(key)

    def test_per_turn_text_equality(self, docs_pdf, corpus_pdf):
        exp = corpus_pdf.sort_values(["conv_id", "turn_idx"])
        assert list(docs_pdf["text"].fillna("")) == \
            list(exp["text"].fillna(""))
        assert list(docs_pdf["role"]) == list(exp["role"])


class TestCorpusStats:
    def test_n_docs_avgdl(self, built_index, oracle_index):
        assert built_index.n_docs == oracle_index.n_docs
        assert built_index.avgdl == pytest.approx(oracle_index.avgdl,
                                                  abs=1e-12)

    def test_df_matches_oracle(self, built_index, oracle_index):
        stats = {r["term"]: r["df"]
                 for r in built_index.term_stats.collect()}
        oracle_df = {t: len(p) for t, p in oracle_index.postings.items()}
        assert stats == oracle_df

    def test_doc_lengths_match(self, built_index, oracle_index, docs_pdf):
        for doc_id, dl in zip(docs_pdf["doc_id"], docs_pdf["dl"]):
            assert oracle_index.doc_len[int(doc_id)] == int(dl)


@pytest.mark.parametrize("q", QUERIES, ids=[q["query_id"] for q in QUERIES])
@pytest.mark.parametrize("method", ["exhaustive", "pruned"])
class TestRankIdentity:
    def test_topk(self, built_index, oracle_index, q, method):
        expected = oracle_index.search(
            q["query_text"], k=q["k"],
            predicate=filters_predicate(q["filters"]))
        got = [(int(r["doc_id"]), float(r["score"])) for r in
               built_index.search(q["query_text"], k=q["k"],
                                  filters=q["filters"],
                                  method=method).collect()]
        assert [d for d, _ in got] == [d for d, _ in expected], \
            f"rank mismatch: {got[:3]} vs {expected[:3]}"
        for (_, gs), (_, es) in zip(got, expected):
            assert gs == pytest.approx(es, abs=1e-9)


class TestQueryEdges:
    def test_match_count(self, built_index, oracle_index):
        n = built_index.match_count("spark shuffle partition")
        exp = len(oracle_index.search("spark shuffle partition",
                                      k=10**9))
        assert n == exp

    def test_hydration_preserves_rank(self, built_index):
        rows = built_index.search("spark shuffle partition", k=5,
                                  hydrate=True).collect()
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r["text"] is not None for r in rows)

    def test_pagination_window(self, built_index, oracle_index):
        """from = page*limit, size = limit (Index.java:397-398)."""
        full = oracle_index.search("data table join", k=20)
        page1 = built_index.search("data table join", k=20).collect()[10:20]
        assert [int(r["doc_id"]) for r in page1] == \
            [d for d, _ in full[10:20]]

    def test_page_param(self, built_index, oracle_index):
        """search(page=1) returns exactly ranks k..2k-1."""
        full = oracle_index.search("data table join", k=20)
        for method in ("exhaustive", "pruned"):
            page1 = built_index.search("data table join", k=10, page=1,
                                       method=method).collect()
            assert [int(r["doc_id"]) for r in page1] == \
                [d for d, _ in full[10:20]], method

    def test_conversation_rollup(self, built_index, oracle_index,
                                 docs_pdf):
        """Conversation-level top-k = per-turn scores folded by conv
        (max agg), matching a python rollup of the oracle's scores."""
        all_hits = oracle_index.search("spark shuffle partition", k=10**9)
        conv_of = dict(zip(docs_pdf["doc_id"], docs_pdf["conv_id"]))
        best: dict[str, float] = {}
        for d, s in all_hits:
            c = conv_of[d]
            if c not in best or s > best[c]:
                best[c] = s
        exp = sorted(best.items(), key=lambda x: (-x[1], x[0]))[:10]
        got = [(r["conv_id"], float(r["score"])) for r in
               built_index.search_conversations(
                   "spark shuffle partition", k=10).collect()]
        assert [c for c, _ in got] == [c for c, _ in exp]
        for (_, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, abs=1e-9)


class TestSearchMany:
    """Batched multi-query execution: ONE job over the union terms must
    be rank- AND bit-identical, per query, to sequential search()."""

    def test_batched_matches_sequential(self, built_index):
        texts = [q["query_text"] for q in QUERIES]
        got = built_index.search_many(texts, k=10).collect()
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), float(r["score"])))
        for qi, text in enumerate(texts):
            single = [(int(r["doc_id"]), float(r["score"])) for r in
                      built_index.search(text, k=10,
                                         method="exhaustive").collect()]
            assert by_q.get(qi, []) == single, f"query {qi}: {text!r}"

    def test_shared_filters(self, built_index):
        texts = ["spark shuffle partition", "data table join"]
        filters = {"role": "user"}
        got = built_index.search_many(texts, k=5, filters=filters) \
            .collect()
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), float(r["score"])))
        for qi, text in enumerate(texts):
            single = [(int(r["doc_id"]), float(r["score"])) for r in
                      built_index.search(text, k=5, filters=filters,
                                         method="exhaustive").collect()]
            assert by_q.get(qi, []) == single

    def test_multi_block_pivot_matches_sequential(self, built_index):
        """The doc-partition pivot walks the match set in
        SEARCH_MANY_DOC_BLOCK-sized dense blocks; a tiny block size
        forces many blocks per partition (the default 2^18 would never
        split at test scale) and must not change a single bit."""
        texts = [q["query_text"] for q in QUERIES]
        built_index.SEARCH_MANY_DOC_BLOCK = 7
        try:
            got = built_index.search_many(texts, k=10).collect()
        finally:
            del built_index.SEARCH_MANY_DOC_BLOCK
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), float(r["score"])))
        for qi, text in enumerate(texts):
            single = [(int(r["doc_id"]), float(r["score"])) for r in
                      built_index.search(text, k=10,
                                         method="exhaustive").collect()]
            assert by_q.get(qi, []) == single, f"query {qi}: {text!r}"

    def test_per_query_filters_and_k(self, built_index):
        """The whole REFERENCE set — each query with its OWN filters
        and its own k — served by one batched job; every query's rows
        must be rank- and bit-identical to sequential search() with
        that query's filters/k.  (Before round 4 search_many took one
        shared filter set, so the reference set could only be batched
        unfiltered.)"""
        texts = [q["query_text"] for q in QUERIES]
        filts = [q["filters"] for q in QUERIES]
        ks = [(3 + qi % 5) for qi in range(len(QUERIES))]
        got = built_index.search_many(texts, k=ks,
                                      filters=filts).collect()
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), float(r["score"])))
        for qi, q in enumerate(QUERIES):
            single = [(int(r["doc_id"]), float(r["score"])) for r in
                      built_index.search(q["query_text"], k=ks[qi],
                                         filters=q["filters"],
                                         method="exhaustive").collect()]
            assert by_q.get(qi, []) == single, \
                f"query {qi}: {q['query_id']}"

    def test_per_query_pages(self, built_index):
        """from/size pagination per query: page p of query q must be
        bit-identical to search(..., page=p) — including a mixed
        batch where each query requests a different page."""
        texts = ["spark shuffle partition", "data table join",
                 "the system"]
        pgs = [0, 1, 2]
        got = built_index.search_many(texts, k=4, page=pgs).collect()
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), float(r["score"])))
        for qi, text in enumerate(texts):
            single = [(int(r["doc_id"]), float(r["score"])) for r in
                      built_index.search(text, k=4, page=pgs[qi],
                                         method="exhaustive").collect()]
            assert by_q.get(qi, []) == single, f"query {qi} page {pgs[qi]}"
        # pages partition the ranking: page 0+1 of one query == top 8
        two = built_index.search_many([texts[0]] * 2, k=4,
                                      page=[0, 1]).collect()
        seq = [(int(r["doc_id"]), float(r["score"])) for r in two]
        top8 = [(int(r["doc_id"]), float(r["score"])) for r in
                built_index.search(texts[0], k=8,
                                   method="exhaustive").collect()]
        assert seq == top8

    def test_hydrate(self, built_index):
        """hydrate=True returns full doc rows per (query_id, hit),
        same ranking, same scores — the controller-style payload."""
        texts = ["spark shuffle partition", "data table join"]
        rows = built_index.search_many(texts, k=3,
                                       hydrate=True).collect()
        assert {"conv_id", "turn_idx", "text", "score",
                "query_id"} <= set(rows[0].asDict())
        flat = built_index.search_many(texts, k=3).collect()
        assert [(int(r["query_id"]), int(r["doc_id"]),
                 float(r["score"])) for r in rows] == \
            [(int(r["query_id"]), int(r["doc_id"]),
              float(r["score"])) for r in flat]

    def test_per_query_list_length_validation(self, built_index):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            built_index.search_many(["a", "b"], k=[5])
        with _pytest.raises(ValueError):
            built_index.search_many(["a", "b"], filters=[None])

    def test_no_match_query_absent(self, built_index):
        got = built_index.search_many(
            ["spark shuffle partition", "zzzqqqxxyy nothing"],
            k=5).collect()
        qids = {int(r["query_id"]) for r in got}
        assert 1 not in qids and 0 in qids

    def test_all_unmatched_returns_empty(self, built_index):
        assert built_index.search_many(["zzzqqqxxyy"], k=5) \
            .count() == 0

    def test_hydrate_schema_on_empty(self, built_index):
        """hydrate=True must keep the hydrated docs schema on the
        all-OOV early return too — a caller selecting doc columns
        from an empty batch result must not hit AnalysisException."""
        df = built_index.search_many(["zzzqqqxxyy"], k=5,
                                     hydrate=True)
        assert {"conv_id", "text", "score", "query_id"} \
            <= set(df.columns)
        assert df.count() == 0


class TestMatchCountMany:
    """Batched total-hits: one JVM-side job (term→query bitmask,
    bit_or doc rollup, fmask filter bits) must equal per-query
    ``match_count`` for every query of the set, including no-match
    queries (counted 0, never absent)."""

    def test_matches_sequential_with_filters(self, built_index):
        texts = [q["query_text"] for q in QUERIES]
        filts = [q["filters"] for q in QUERIES]
        got = {int(r["query_id"]): int(r["n_matches"]) for r in
               built_index.match_count_many(texts,
                                            filters=filts).collect()}
        assert set(got) == set(range(len(texts)))
        for qi, q in enumerate(QUERIES):
            assert got[qi] == built_index.match_count(
                q["query_text"], filters=q["filters"]), q["query_id"]

    def test_unfiltered_and_absent(self, built_index):
        texts = ["spark shuffle partition", "zzzqqqxxyy"]
        got = {int(r["query_id"]): int(r["n_matches"]) for r in
               built_index.match_count_many(texts).collect()}
        assert got[1] == 0
        assert got[0] == built_index.match_count(texts[0])

    def test_all_unmatched_still_rows(self, built_index):
        got = {int(r["query_id"]): int(r["n_matches"]) for r in
               built_index.match_count_many(["zzzqqqxxyy"]).collect()}
        assert got == {0: 0}


class TestSearchManyPruned:
    """Batched sidecar pruning (``search_many(method='pruned')``):
    per-query θ + surviving sets from the shared ``pc_bounds`` read,
    ONE scan over the union of surviving pcs.  Pruning is FORCED
    through the prunability gate (the tiny corpus would otherwise
    route every query to exhaustive), and every query's rows must stay
    rank- AND bit-identical to sequential exhaustive ``search()`` —
    the union-scan admissibility argument checked in practice."""

    @pytest.fixture()
    def forced(self, built_index):
        built_index.PRUNE_MIN_FRACTION = -1.0
        try:
            yield built_index
        finally:
            del built_index.PRUNE_MIN_FRACTION

    @staticmethod
    def _by_query(rows):
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), float(r["score"])))
        return by_q

    def _assert_matches_sequential(self, idx, texts, k,
                                   filters=None, method="pruned"):
        got = self._by_query(
            idx.search_many(texts, k=k, filters=filters,
                            method=method).collect())
        for qi, text in enumerate(texts):
            single = [(int(r["doc_id"]), float(r["score"])) for r in
                      idx.search(text, k=k, filters=filters,
                                 method="exhaustive").collect()]
            assert got.get(qi, []) == single, f"query {qi}: {text!r}"

    def test_forced_pruned_matches_sequential(self, forced):
        texts = [q["query_text"] for q in QUERIES]
        self._assert_matches_sequential(forced, texts, k=10)

    def test_forced_pruned_with_shared_filters(self, forced):
        texts = ["spark shuffle partition", "data table join"]
        self._assert_matches_sequential(forced, texts, k=5,
                                        filters={"role": "user"})

    def test_forced_pruned_with_per_query_filters(self, forced):
        """Per-query filters through the batched SIDECAR path: each
        query's θ seed folds under its own filters, and the fmask
        candidate bits compose with per-query pc restriction."""
        sub = [q for q in QUERIES if q["query_text"]
               != "zzzzunknownterm"]
        texts = [q["query_text"] for q in sub]
        filts = [q["filters"] for q in sub]
        ks = [(2 + qi % 4) for qi in range(len(sub))]
        got = self._by_query(
            forced.search_many(texts, k=ks, filters=filts,
                               method="pruned").collect())
        for qi, q in enumerate(sub):
            single = [(int(r["doc_id"]), float(r["score"])) for r in
                      forced.search(q["query_text"], k=ks[qi],
                                    filters=q["filters"],
                                    method="exhaustive").collect()]
            assert got.get(qi, []) == single, (qi, q["query_id"])

    def test_decision_branch_is_pruned(self, forced):
        """The forced batch must actually take the per-query
        ``("pruned", ...)`` branch of ``_sidecar_surviving`` — not
        fall through to exhaustive — for every reference query."""
        G = max(64, forced.chunk_size // 32)
        assert int(forced.config["pc_granularity"]) == G
        for q in QUERIES:
            terms = [t for t in forced.query_terms(q["query_text"])]
            idf = forced.idf_map(terms)
            if not idf:
                continue
            pdf = forced._pc_bounds_pdf(sorted(idf))
            assert pdf is not None
            decision = forced._sidecar_surviving(
                idf, None, 10, 32, G, pdf)
            assert decision[0] == "pruned", (q["query_id"], decision)

    def test_unprunable_query_forces_exhaustive_batch(self, forced):
        """SURVIVING_MAX_PCS = 0 makes every query's decision
        ``("all",)`` → the whole batch must fall back to the plain
        exhaustive scan and stay identical."""
        forced.SURVIVING_MAX_PCS = 0
        try:
            texts = [q["query_text"] for q in QUERIES[:3]]
            self._assert_matches_sequential(forced, texts, k=10)
        finally:
            del forced.SURVIVING_MAX_PCS

    def test_auto_picks_pruned_with_sidecar(self, built_index):
        """method='auto' must route through the batched pruned path
        when the sidecar exists (gates may still choose 'all' per
        query — identity is the contract either way)."""
        texts = [q["query_text"] for q in QUERIES[:4]]
        self._assert_matches_sequential(built_index, texts, k=10,
                                        method="auto")

"""Randomized rank-identity: seeded random queries (term mixes, ks,
filters) must agree between the engine (both scoring strategies) and
the pure-python oracle — broadening the fixed reference query set.
Also the WAND admissibility property from SURVEY §5: pruning must
never change top-k."""

from __future__ import annotations

import random

import pytest

from moera_search_spark.fixtures import BASE_TS, filters_predicate

VOCAB_SAMPLE = [
    "the", "system", "query", "index", "spark", "join", "window",
    "shuffle", "partition", "results", "data", "table", "scan", "merge",
    "term0007", "term0123", "term1847", "zzznotaterm", "running",
    "world's", "cache", "disk", "error", "retry", "plan",
]
FILTER_CHOICES = [
    None,
    {"role": "assistant"},
    {"role": "tool", "tool": "bash"},
    {"tool": "search"},
]


def _random_queries(n: int, seed: int = 7):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        n_terms = rng.randint(1, 5)
        text = " ".join(rng.choice(VOCAB_SAMPLE) for _ in range(n_terms))
        filters = rng.choice(FILTER_CHOICES)
        if filters and rng.random() < 0.3:
            from datetime import timedelta

            filters = dict(filters)
            filters["ts_min"] = BASE_TS + timedelta(hours=rng.randint(0, 50))
        out.append({"text": text, "filters": filters,
                    "k": rng.choice([1, 5, 10, 25])})
    return out


@pytest.mark.parametrize("q", _random_queries(20),
                         ids=lambda q: q["text"][:25].replace(" ", "_"))
def test_fuzz_rank_identity(built_index, oracle_index, q):
    expected = oracle_index.search(
        q["text"], k=q["k"], predicate=filters_predicate(q["filters"]))
    # "pruned+forced" drives the seed/rest machinery through the
    # prunability gate even on this small corpus (the gate would
    # otherwise route to the single exhaustive action)
    for method in ("exhaustive", "pruned", "pruned+forced"):
        forced = method == "pruned+forced"
        if forced:
            built_index.PRUNE_MIN_FRACTION = -1.0
        try:
            got = [(int(r["doc_id"]), float(r["score"])) for r in
                   built_index.search(q["text"], k=q["k"],
                                      filters=q["filters"],
                                      method=method.split("+")[0])
                   .collect()]
        finally:
            if forced:
                del built_index.PRUNE_MIN_FRACTION
        assert [d for d, _ in got] == [d for d, _ in expected], \
            (method, q)
        for (_, gs), (_, es) in zip(got, expected):
            assert gs == pytest.approx(es, abs=1e-9)


@pytest.mark.parametrize("seed", [11, 29, 53])
@pytest.mark.parametrize("forced", [False, True],
                         ids=["auto", "pruned+forced"])
def test_fuzz_batched_rank_identity(built_index, oracle_index,
                                    seed, forced):
    """The batched path under the same randomization: a whole random
    query SET — per-query k, filters and page — served by ONE
    search_many job must agree per query with the pure-python oracle
    (and hence with sequential search()), through both the exhaustive
    batch and the forced batched-sidecar pruning."""
    rng = random.Random(seed)
    qs = _random_queries(8, seed=seed)
    pages = [rng.choice([0, 0, 1, 2]) for _ in qs]
    texts = [q["text"] for q in qs]
    if forced:
        built_index.PRUNE_MIN_FRACTION = -1.0
    try:
        got = built_index.search_many(
            texts, k=[q["k"] for q in qs],
            filters=[q["filters"] for q in qs], page=pages,
            method="pruned" if forced else "auto").collect()
    finally:
        if forced:
            del built_index.PRUNE_MIN_FRACTION
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["score"])))
    for qi, q in enumerate(qs):
        depth = (pages[qi] + 1) * q["k"]
        full = oracle_index.search(
            q["text"], k=depth,
            predicate=filters_predicate(q["filters"]))
        expected = full[pages[qi] * q["k"]:depth]
        rows = by_q.get(qi, [])
        assert [d for d, _ in rows] == [d for d, _ in expected], \
            (qi, q, pages[qi])
        for (_, gs), (_, es) in zip(rows, expected):
            assert gs == pytest.approx(es, abs=1e-9)


@pytest.mark.parametrize("seed", [17, 71])
def test_fuzz_chunked_batch_rank_identity(built_index, oracle_index,
                                          seed):
    """Auto-chunked batches (round 5: >62 distinct filter sets split
    into sub-batches internally) under the same randomization: 70
    queries, each with a DISTINCT ts_min filter (forcing ≥2
    sub-batches), random k and page — per-query results must equal
    the pure-python oracle exactly, proving sub-batch boundaries and
    query_id remapping can never leak between queries."""
    from datetime import timedelta

    rng = random.Random(seed)
    qs = _random_queries(70, seed=seed)
    filters, pages = [], []
    for i, q in enumerate(qs):
        f = dict(q["filters"] or {})
        f["ts_min"] = BASE_TS + timedelta(minutes=7 * i + rng.randint(0, 5))
        filters.append(f)
        pages.append(rng.choice([0, 0, 1]))
    texts = [q["text"] for q in qs]
    got = built_index.search_many(
        texts, k=[q["k"] for q in qs], filters=filters,
        page=pages).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["score"])))
    for qi, q in enumerate(qs):
        depth = (pages[qi] + 1) * q["k"]
        full = oracle_index.search(
            q["text"], k=depth,
            predicate=filters_predicate(filters[qi]))
        expected = full[pages[qi] * q["k"]:depth]
        rows = by_q.get(qi, [])
        assert [d for d, _ in rows] == [d for d, _ in expected], \
            (qi, q, pages[qi])
        for (_, gs), (_, es) in zip(rows, expected):
            assert gs == pytest.approx(es, abs=1e-9)

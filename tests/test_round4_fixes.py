"""Round-4 regression coverage.

* The two catalog entries retired from the 50-row driver window
  (``filter_prefix_ci``, ``join_fanout_ids``) stay DuckDB-verified
  here — they remain implemented SURVEY §2 operators, they just gave
  their driver slots to the engine serving ops.
* The new ``fts_search_many`` / ``fts_match_count`` driver entries:
  cross-checked against DuckDB at sf0.001 (the driver gate runs them
  at sf0.01) and against the engine's own single-query ``search()``.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["customer", "orders", "documents", "events"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _parity(spark, duck, fn, sql):
    a = _norm(fn(spark, SF_DIR).toPandas())
    b = _norm(duck.execute(sql).df())
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestRetiredCatalogEntries:
    def test_filter_prefix_ci(self, spark, duck):
        from moera_search_spark.operators.relational import (
            FILTER_PREFIX_CI_SQL, filter_prefix_ci)

        _parity(spark, duck, filter_prefix_ci, FILTER_PREFIX_CI_SQL)

    def test_join_fanout_ids(self, spark, duck):
        from moera_search_spark.operators.relational import (
            JOIN_FANOUT_IDS_SQL, join_fanout_ids)

        _parity(spark, duck, join_fanout_ids, JOIN_FANOUT_IDS_SQL)

    def test_rank_keyset_pagination(self, spark, duck):
        from moera_search_spark.operators.relational import (
            RANK_KEYSET_PAGINATION_SQL, rank_keyset_pagination)

        _parity(spark, duck, rank_keyset_pagination,
                RANK_KEYSET_PAGINATION_SQL)


class TestEngineServingEntries:
    def test_search_many_vs_duckdb(self, spark, duck):
        from moera_search_spark.operators.engine_serving import (
            FTS_SEARCH_MANY_SQL, fts_search_many)

        _parity(spark, duck, fts_search_many, FTS_SEARCH_MANY_SQL)

    def test_match_count_vs_duckdb(self, spark, duck):
        from moera_search_spark.operators.engine_serving import (
            FTS_MATCH_COUNT_SQL, fts_match_count)

        _parity(spark, duck, fts_match_count, FTS_MATCH_COUNT_SQL)

    def test_search_many_rank_parity_to_search(self, spark):
        """Per-query rows of the batched path are rank- and
        bit-identical to the single-query exhaustive path."""
        from moera_search_spark.operators.engine_serving import (
            MANY_QUERIES, _shared_index)

        idx = _shared_index(spark, SF_DIR)
        many = idx.search_many(MANY_QUERIES, k=10).collect()
        by_q: dict[int, list] = {}
        for r in many:
            by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
        for qi, q in enumerate(MANY_QUERIES):
            single = [(r.doc_id, r.score)
                      for r in idx.search(q, k=10,
                                          method="exhaustive").collect()]
            assert by_q.get(qi, []) == single, f"query {qi}: {q!r}"

    def test_match_count_matches_scored_rows(self, spark):
        from moera_search_spark.operators.engine_serving import (
            MANY_QUERIES, _shared_index)

        idx = _shared_index(spark, SF_DIR)
        for q in MANY_QUERIES:
            n = idx.match_count(q)
            # k = n_docs (not a huge literal): TakeOrderedAndProject
            # allocates a size-k buffer per task
            assert n == idx.search(q, k=idx.n_docs,
                                   method="exhaustive").count()

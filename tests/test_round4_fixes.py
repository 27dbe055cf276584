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


class TestZeroTermSegments:
    """The run-shuffle staging crashed when a (bucket, chunk) segment
    contained ONLY zero-term docs (flush() guarded the accumulator
    LIST, not the concatenated length) — found by the round-4 2^18
    validation, where ~15-doc buckets make all-empty segments real."""

    def _transcripts(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")

    def test_all_empty_corpus_fails_loudly(self, spark, tmp_path):
        """A corpus where EVERY doc tokenizes empty has no postings
        schema to write — the build must refuse with a clear error
        (not the schema-inference crash it used to die with three
        stages later), and the staging pass must survive the
        all-empty segments on the way there."""
        import datetime as dt

        import pytest as _pytest

        from moera_search_spark.build import build_index

        ts = dt.datetime(2026, 1, 1)
        rows = [(f"c-{i:02d}", j, "user", "", None, ts)
                for i in range(3) for j in range(4)]
        with _pytest.raises(ValueError, match="zero indexable terms"):
            build_index(spark, self._transcripts(spark, rows),
                        str(tmp_path / "idx"), n_buckets=2)

    def test_empty_conv_isolated_in_own_bucket(self, spark, tmp_path):
        import datetime as dt

        from moera_search_spark.build import build_index
        from moera_search_spark.query import FTSIndex

        ts = dt.datetime(2026, 1, 1)
        rows = ([("a-empty", j, "user", "   ", None, ts)
                 for j in range(5)]
                + [("b-full", j, "user", "spark window join", None, ts)
                   for j in range(5)])
        res = build_index(spark, self._transcripts(spark, rows),
                          str(tmp_path / "idx"), n_buckets=2)
        assert res["n_docs"] == 10
        idx = FTSIndex(spark, str(tmp_path / "idx"))
        assert idx.search("spark", k=10).count() == 5
        assert idx.docs.filter("dl = 0").count() == 5

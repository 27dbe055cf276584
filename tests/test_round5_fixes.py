"""Round-5 verdict/advice closures.

* ``fts_phrase_match`` driver row now runs the REAL positional engine
  (VERDICT r4 missing #2) — rank parity engine-row ↔ expression-twin
  is pinned here, so the swap can never silently change the ranking
  the round-4 catalog verified.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestPhraseDriverRowEngineParity:
    def test_engine_row_matches_expression_twin(self, spark):
        """The engine-backed driver row (engine_serving.fts_phrase_match,
        positional index end-to-end) and the round-4 expression twin
        (fulltext.fts_phrase_match_expr, HOF anchor-count over the raw
        docs) must agree row-for-row: same doc_ids, same ptf, same
        e6-rounded scores, same order."""
        from moera_search_spark.operators.engine_serving import (
            fts_phrase_match)
        from moera_search_spark.operators.fulltext import (
            fts_phrase_match_expr)

        eng = [(r["doc_id"], r["ptf"], r["score_e6"])
               for r in fts_phrase_match(spark, SF_DIR).collect()]
        twin = [(r["doc_id"], r["ptf"], r["score_e6"])
                for r in fts_phrase_match_expr(spark, SF_DIR).collect()]
        assert eng == twin
        assert len(eng) > 0

    def test_engine_search_phrase_emits_ptf(self, spark):
        """PHRASE_SCHEMA grew a ptf column (Lucene's freq, exposed so
        the driver row can hash it cross-engine); it must equal the
        phrase frequency the score implies."""
        import math

        from moera_search_spark.operators.engine_serving import (
            _shared_index)
        from moera_search_spark.operators.fulltext import PHRASE

        idx = _shared_index(spark, SF_DIR)
        rows = idx.search_phrase(" ".join(PHRASE), k=5).collect()
        assert rows
        for r in rows:
            assert r["ptf"] >= 1
            assert math.isfinite(r["score"]) and r["score"] > 0

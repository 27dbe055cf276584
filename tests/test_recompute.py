"""Scheduled full-recompute jobs: DuckDB-oracle-verified values and
atomic-swap idempotency (reference: PostingIngest.java:249-268 hourly
popularity refresh; Workload.java:20-41 periods)."""

from __future__ import annotations

import os

import duckdb
import pytest

from moera_search_spark.operators.relational import (
    AGG_TWO_TRACK_DECAY_SQL,
)
from moera_search_spark.operators.scalar_funcs import (
    AGG_NODE_ACTIVITY_SQL,
)
from moera_search_spark.recompute import (
    refresh_activity,
    refresh_popularity,
)

SF_DIR = "/root/testdata/sf0.001"
NOW_MS = 1706745600000    # matches the catalog entries' fixed "now"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _duck(sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{SF_DIR}/events.parquet'")
    return {int(u): tuple(int(v) for v in rest)
            for u, *rest in con.execute(sql).fetchall()}


class TestRefreshJobs:
    def test_popularity_matches_duckdb_oracle(self, spark, events,
                                              tmp_path):
        out = str(tmp_path / "stats")
        res = refresh_popularity(spark, events, out, now_ms=NOW_MS)
        got = {int(r["user_id"]): (int(r["popularity_e6"]),
                                   int(r["fad_e6"]))
               for r in spark.read.parquet(res["table"]).collect()}
        want = _duck(AGG_TWO_TRACK_DECAY_SQL)
        assert got == want and got

    def test_activity_matches_duckdb_oracle(self, spark, events,
                                            tmp_path):
        out = str(tmp_path / "stats")
        res = refresh_activity(spark, events, out)
        got = {int(r["user_id"]): (int(r["activity_e6"]),)
               for r in spark.read.parquet(res["table"]).collect()}
        want = _duck(AGG_NODE_ACTIVITY_SQL)
        assert got == want and got

    def test_refresh_is_idempotent_and_atomic_swap(self, spark, events,
                                                   tmp_path):
        out = str(tmp_path / "stats")
        r1 = refresh_popularity(spark, events, out, now_ms=NOW_MS)
        first = sorted(
            (int(r["user_id"]), int(r["popularity_e6"]))
            for r in spark.read.parquet(r1["table"]).collect())
        r2 = refresh_popularity(spark, events, out, now_ms=NOW_MS)
        second = sorted(
            (int(r["user_id"]), int(r["popularity_e6"]))
            for r in spark.read.parquet(r2["table"]).collect())
        assert first == second
        # no half-written generations left behind
        leftovers = [d for d in os.listdir(out)
                     if d.endswith((".next", ".old"))]
        assert leftovers == []

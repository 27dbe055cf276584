"""Watermarked windowed aggregation + applyInPandasWithState
sessionization (streaming.py).

Determinism comes from the file source: one parquet file per
micro-batch (``maxFilesPerTrigger=1``, ``latestFirst=false``, files
named in lexical order), so the watermark after each batch — max
event time seen minus the delay — is exactly known, and every
emit/drop decision below is forced by the spec:

* append-mode windows emit exactly once, in the first batch whose
  (previous-batch) watermark passes the window end;
* rows older than the watermark are dropped, rows late but inside it
  still reach their window;
* sessions emit only in the first batch whose watermark passes
  last_event + gap (with data or by event-time timeout); until then
  they are pending state that late in-watermark events can extend or
  bridge.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from moera_search_spark.streaming import (
    stream_sessionize,
    stream_windowed_activity,
)


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, value) — one file per call.  The
    trailing sleep keeps modification times distinct so the file
    source's oldest-first listing matches write order (ties would
    scramble micro-batch order and with it the watermark sequence)."""
    import time

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "value"])
    pdf["event_type"] = "e"
    pdf["props"] = "{}"
    (spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value",
             "props"]])
        .coalesce(1).write.mode("append").parquet(path))
    time.sleep(1.2)


class TestWindowedActivity:
    def test_watermark_emit_and_late_row_semantics(self, spark,
                                                   tmp_path):
        """Spark's documented watermark contract: a row later than the
        watermark is guaranteed dropped once its window's state has
        been evicted (eviction runs at batch end, with the watermark
        fixed at batch start); a late row INSIDE the watermark still
        reaches its open window; append mode emits each window exactly
        once."""
        src = str(tmp_path / "events")
        # batch 0: two users in [10:00, 11:00), plus 12:50 so the
        # NEXT batch runs with watermark 12:20
        _write_events(spark, src, [
            (1, _ts(10, 5), 1, 1.0),
            (2, _ts(10, 10), 1, 2.0),
            (3, _ts(10, 20), 2, 4.0),
            (4, _ts(12, 50), 3, 8.0)])
        # batch 1 (wm 12:20): late-but-inside row 12:30 merges into
        # the open [12:00, 13:00) window; 14:00 advances wm to 13:30;
        # the [10:00, 11:00) windows evict + emit at batch end
        _write_events(spark, src, [
            (6, _ts(12, 30), 3, 16.0),
            (7, _ts(14, 0), 4, 32.0)])
        # batch 2 (wm 13:30): row 10:15 is later than the watermark
        # AND its window was already evicted → dropped, no duplicate
        # emission; [12:00, 13:00) evicts + emits with both rows
        _write_events(spark, src, [
            (5, _ts(10, 15), 1, 100.0),
            (8, _ts(15, 0), 5, 1.0)])
        # batch 3: advances wm to 14:30 → [14:00, 15:00) emits;
        # [15:00) / [16:00) stay open and must be absent
        _write_events(spark, src, [(9, _ts(16, 0), 6, 1.0)])

        out = str(tmp_path / "out")
        q = stream_windowed_activity(
            spark, src, checkpoint_dir=str(tmp_path / "ck"),
            out_dir=out, window="1 hour", watermark="30 minutes",
            max_files_per_trigger=1, timeout_sec=120)

        got = {(r["win_start"].hour, r["user_id"]):
               (r["n_events"], r["sum_value"])
               for r in spark.read.parquet(out).collect()}
        assert got == {
            (10, 1): (2, 3.0),       # too-late row 5 NOT added
            (10, 2): (1, 4.0),
            (12, 3): (2, 24.0),      # late-but-inside row 6 added
            (14, 4): (1, 32.0),
        }
        dropped = sum(so["numRowsDroppedByWatermark"]
                      for p in q.recentProgress
                      for so in p["stateOperators"])
        assert dropped == 1          # exactly row 5

    def test_plan_is_stateful_streaming_agg(self, spark, tmp_path):
        # the rollup must be a streaming state-store aggregation, not
        # a batch collect: assert the unresolved plan carries the
        # watermark marker (EventTimeWatermark node)
        src = str(tmp_path / "events")
        _write_events(spark, src, [(1, _ts(10), 1, 1.0)])
        from pyspark.sql import functions as F
        events = (spark.readStream
                  .schema("event_id long, ts timestamp, user_id long, "
                          "event_type string, value double, "
                          "props string")
                  .parquet(src))
        agg = (events.withWatermark("ts", "30 minutes")
               .groupBy(F.window("ts", "1 hour"), "user_id").count())
        assert "EventTimeWatermark" in str(agg._jdf.queryExecution()
                                           .logical())


class TestSessionize:
    def test_gap_close_and_event_time_timeout(self, spark, tmp_path):
        """Sessions emit only when the watermark passes last + gap:
        alongside newer data for the same user (batch 1 emits user 1's
        first session), by event-time timeout with no data (user 2 in
        batch 1; user 1's later sessions in batch 2 and the flush
        batch), and never while still inside the watermark (user 9)."""
        src = str(tmp_path / "events")
        # batch 0 (wm 0 — nothing can emit): user 1 accumulates
        # pending sessions [10:00-10:10] and [11:30]; user 2 [10:00]
        _write_events(spark, src, [
            (1, _ts(10, 0), 1, 1.0),
            (2, _ts(10, 10), 1, 2.0),
            (3, _ts(11, 30), 1, 4.0),
            (4, _ts(10, 0), 2, 8.0)])
        # batch 1 (wm 11:00): user 1's new 13:00 event arrives and its
        # [10:00-10:10] session emits with it (close 10:40 ≤ wm);
        # user 2 has no data → timeout fires, [10:00] emits
        _write_events(spark, src, [(5, _ts(13, 0), 1, 16.0)])
        # batch 2 (wm 12:30): user 1 times out → [11:30] emits (close
        # 12:00 ≤ wm), [13:00] kept; the flush batch (wm 15:30) then
        # emits [13:00] (close 13:30 ≤ wm) while user 9's session
        # (close 16:30) stays open
        _write_events(spark, src, [(6, _ts(16, 0), 9, 32.0)])

        out = str(tmp_path / "out")
        stream_sessionize(
            spark, src, checkpoint_dir=str(tmp_path / "ck"),
            out_dir=out, gap="30 minutes", watermark="30 minutes",
            max_files_per_trigger=1, timeout_sec=120)

        rows = spark.read.parquet(out).collect()
        got = {(r["user_id"], r["session_start"].strftime("%H:%M")):
               (r["session_end"].strftime("%H:%M"), r["n_events"],
                r["sum_value"]) for r in rows}
        assert got == {
            (1, "10:00"): ("10:10", 2, 3.0),   # emitted with batch-1 data
            (1, "11:30"): ("11:30", 1, 4.0),   # batch-2 timeout
            (2, "10:00"): ("10:00", 1, 8.0),   # batch-1 timeout
            (1, "13:00"): ("13:00", 1, 16.0),  # flush-batch timeout
        }
        assert len(rows) == 4                  # user 9 still open



    def test_late_event_merges_and_bridges_pending_sessions(
            self, spark, tmp_path):
        """The review-found failure modes: a late-but-in-watermark
        event must merge into the pending session it belongs to (not
        regress its end or land in a newer session), and an event
        falling between two provisionally-separate sessions must
        bridge them into one.  Deferred emission makes both safe: no
        session emits until the watermark passes its close."""
        src = str(tmp_path / "events")
        # batch 0 (max ts 10:00 -> wm during batch 1 is 6:00): user 1
        # opens [10:00]; user 2 accumulates [9:00] and [9:40] (40-min
        # gap -> provisionally two sessions)
        _write_events(spark, src, [
            (1, _ts(10, 0), 1, 1.0),
            (2, _ts(9, 0), 2, 4.0),
            (3, _ts(9, 40), 2, 8.0)])
        # batch 1: late 10:10 extends user 1's session; late 9:20
        # BRIDGES user 2's two sessions (9:20 <= 9:00+30 and
        # 9:40 <= 9:20+30); 18:00 pushes the flush watermark to 14:00
        _write_events(spark, src, [
            (4, _ts(10, 10), 1, 2.0),
            (5, _ts(9, 20), 2, 16.0),
            (6, _ts(18, 0), 3, 1.0)])

        out = str(tmp_path / "out")
        stream_sessionize(
            spark, src, checkpoint_dir=str(tmp_path / "ck"),
            out_dir=out, gap="30 minutes", watermark="4 hours",
            max_files_per_trigger=1, timeout_sec=120)

        rows = spark.read.parquet(out).collect()
        got = {(r["user_id"], r["session_start"].strftime("%H:%M")):
               (r["session_end"].strftime("%H:%M"), r["n_events"],
                r["sum_value"]) for r in rows}
        assert got == {
            (1, "10:00"): ("10:10", 2, 3.0),    # late event merged
            (2, "09:00"): ("09:40", 3, 28.0),   # bridge -> ONE session
        }
        assert len(rows) == 2                   # user 3 still open

    def test_single_batch_multi_session_split(self, spark, tmp_path):
        # three sessions of one user inside ONE micro-batch: the two
        # whose close passes the flush watermark (10:30) emit; the
        # trailing one stays open
        src = str(tmp_path / "events")
        _write_events(spark, src, [
            (1, _ts(8, 0), 7, 1.0), (2, _ts(8, 5), 7, 1.0),
            (3, _ts(9, 0), 7, 1.0),
            (4, _ts(10, 30), 7, 1.0), (5, _ts(10, 40), 7, 1.0)])
        out = str(tmp_path / "out")
        stream_sessionize(
            spark, src, checkpoint_dir=str(tmp_path / "ck"),
            out_dir=out, gap="30 minutes", watermark="10 minutes",
            timeout_sec=120)
        got = sorted((r["session_start"].hour, r["n_events"])
                     for r in spark.read.parquet(out).collect())
        assert got == [(8, 2), (9, 1)]


class TestRealDataDuckDBParity:
    """The two streaming operators over the REAL sf0.01 events table
    (10k events, 150 users, 30 days), checked against DuckDB batch
    recomputes of the emit semantics.  The directory holds one parquet
    file → one data micro-batch (watermark 0, so every in-batch gap
    close emits) plus the availableNow flush batch whose watermark is
    max(ts) − delay; what must emit is then a pure function of the
    data:

    * windows: every (window, user) group whose window end ≤ flush
      watermark, with exact count/sum;
    * sessions: exactly those whose last event + gap ≤ flush
      watermark (append semantics — a session emits only when the
      watermark passes its close, by timeout or alongside new data).
    """

    EVENTS = "/root/testdata/sf0.01/events.parquet"

    def test_windowed_rollup_matches_duckdb(self, spark, tmp_path):
        import duckdb
        import shutil

        src = str(tmp_path / "events")
        (tmp_path / "events").mkdir()
        shutil.copy(self.EVENTS, src + "/part-0.parquet")
        out = str(tmp_path / "out")
        stream_windowed_activity(
            spark, src, checkpoint_dir=str(tmp_path / "ck"),
            out_dir=out, window="1 hour", watermark="1 hour",
            timeout_sec=300)
        got = {(r["win_start"], r["user_id"]):
               (r["n_events"], round(r["sum_value"], 6))
               for r in spark.read.parquet(out).collect()}
        exp_rows = duckdb.sql(f"""
            WITH wm AS (
              SELECT max(ts) - INTERVAL 1 HOUR AS w
              FROM read_parquet('{self.EVENTS}')
            )
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
                   user_id, count(*) AS n, round(sum(value), 6) AS sv
            FROM read_parquet('{self.EVENTS}'), wm
            GROUP BY 1, 2, wm.w
            HAVING win_start + INTERVAL 1 HOUR <= wm.w
        """).fetchall()
        exp = {(r[0], r[1]): (r[2], r[3]) for r in exp_rows}
        assert len(exp) > 1000
        assert got == exp

    def test_sessionize_matches_duckdb(self, spark, tmp_path):
        import duckdb
        import shutil

        src = str(tmp_path / "events")
        (tmp_path / "events").mkdir()
        shutil.copy(self.EVENTS, src + "/part-0.parquet")
        out = str(tmp_path / "out")
        stream_sessionize(
            spark, src, checkpoint_dir=str(tmp_path / "ck"),
            out_dir=out, gap="1 day", watermark="1 hour",
            timeout_sec=300)
        got = {(r["user_id"], r["session_start"]):
               (r["session_end"], r["n_events"],
                round(r["sum_value"], 6))
               for r in spark.read.parquet(out).collect()}
        exp_rows = duckdb.sql(f"""
            WITH e AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w >= INTERVAL 1 DAY
                          THEN 1 ELSE 0 END AS brk
              FROM read_parquet('{self.EVENTS}')
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM e
            ), sess AS (
              SELECT user_id, min(ts) AS st, max(ts) AS en,
                     count(*) AS n, round(sum(value), 6) AS sv
              FROM s GROUP BY user_id, sid
            ), wm AS (
              SELECT max(ts) - INTERVAL 1 HOUR AS w
              FROM read_parquet('{self.EVENTS}')
            )
            SELECT user_id, st, en, n, sv FROM sess, wm
            WHERE en + INTERVAL 1 DAY <= wm.w
        """).fetchall()
        exp = {(r[0], r[1]): (r[2], r[3], r[4]) for r in exp_rows}
        assert len(exp) > 300
        assert got == exp

        # triangulate with the driver-checked batch twin: the stream's
        # emitted sessions are exactly the batch gap-fold filtered to
        # closed-by-watermark (same half-open gap semantics)
        import datetime

        from moera_search_spark.operators.relational import (
            sessionize_gap_batch)

        wm = max(r[0] for r in duckdb.sql(
            f"SELECT max(ts) FROM read_parquet('{self.EVENTS}')"
        ).fetchall()) - datetime.timedelta(hours=1)

        def us2dt(us):
            return datetime.datetime(1970, 1, 1) \
                + datetime.timedelta(microseconds=int(us))

        twin = {(r["user_id"], us2dt(r["session_start_us"])):
                (us2dt(r["session_end_us"]), r["n_events"],
                 round(r["sum_value_e6"] / 1e6, 6))
                for r in sessionize_gap_batch(
                    spark, "/root/testdata/sf0.01").collect()
                if (us2dt(r["session_end_us"])
                    + datetime.timedelta(days=1)) <= wm}
        assert twin == got

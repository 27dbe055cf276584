"""Round-2 correctness fixes, each pinned by a regression test:

* block-max bound admissibility when idf goes negative under delta
  semantics (df segment-summed, N live — the Lucene-divergence case);
* crash-idempotent ``apply_updates`` (retry after a crash at any point
  in the mutation sequence converges to the clean result);
* per-key op collapse in streaming micro-batches (ordered changelog
  semantics for delete/upsert races on one key);
* null conv_id rejection in the build (loud failure, not silent drop).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moera_search_spark import incremental as incr
from moera_search_spark import manifest as mf
from moera_search_spark.build import build_index
from moera_search_spark.incremental import apply_updates
from moera_search_spark.query import FTSIndex

TS = "2026-01-01 00:00:00"


TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")


def _transcripts(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    pdf["role"] = "user"
    pdf["tool"] = None
    pdf["ts"] = pd.Timestamp(TS)
    return spark.createDataFrame(
        pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
        TRANSCRIPT_DDL)


def _topk(idx, q, method, k=10):
    return [(int(r["doc_id"]), round(float(r["score"]), 12))
            for r in idx.search(q, k=k, method=method).collect()]


class TestNegativeIdfPruning:
    def test_pruned_matches_exhaustive_with_negative_idf(
            self, spark, tmp_path):
        """Delete most docs containing a term so df > N for it
        ((N+1)/(df+0.5) < 1 → idf < 0); the clamped chunk bound must
        keep pruning admissible (ADVICE round 1, query.py:273)."""
        rows = [(f"conv-{i:04d}", 0, "zebrafish swims deep") for i in
                range(20)]
        rows += [(f"conv-9{i:03d}", 0, f"other filler text {i}") for i in
                 range(5)]
        idx_dir = str(tmp_path / "negidf")
        build_index(spark, _transcripts(spark, rows), idx_dir,
                    n_buckets=4, chunk_size=4)
        deletes = _transcripts(
            spark, [(f"conv-{i:04d}", 0, "") for i in range(18)]) \
            .select("conv_id", "turn_idx")
        apply_updates(spark, idx_dir, deletes=deletes, batch_id="kill")

        idx = FTSIndex(spark, idx_dir)
        # the divergence precondition actually holds: idf < 0
        idf = idx.idf_map(idx.query_terms("zebrafish"))
        assert idf[next(iter(idf))] < 0, "test setup: idf must be negative"
        for q in ("zebrafish", "zebrafish other", "zebrafish text"):
            assert _topk(idx, q, "pruned") == _topk(idx, q, "exhaustive")


def _mini_corpus(spark):
    rows = [(f"conv-{i:04d}", t, f"alpha beta term{i % 7} turn {t}")
            for i in range(30) for t in range(2)]
    return _transcripts(spark, rows)


def _state(spark, idx_dir):
    idx = FTSIndex(spark, idx_dir)
    docs = (idx.live_docs.select("conv_id", "turn_idx", "text")
            .orderBy("conv_id", "turn_idx").collect())
    return {
        "n_docs": idx.n_docs,
        "avgdl": round(idx.avgdl, 9),
        "docs": [(r["conv_id"], r["turn_idx"], r["text"]) for r in docs],
        "topk": _topk(idx, "alpha term3", "exhaustive"),
    }


class TestCrashIdempotentApply:
    """Retry-after-crash converges to the clean-twin state (ADVICE
    round 1, incremental.py:196: adoption idempotency + commit-last)."""

    @pytest.fixture()
    def pair(self, spark, tmp_path):
        base = _mini_corpus(spark)
        dirs = []
        for name in ("clean", "crashy"):
            d = str(tmp_path / name)
            build_index(spark, base, d, n_buckets=2)
            dirs.append(d)
        ups = _transcripts(spark, [
            ("conv-0001", 0, "revised text one"),
            ("conv-5000", 0, "entirely new turn"),
        ])
        dels = _transcripts(spark, [("conv-0002", 0, "")]) \
            .select("conv_id", "turn_idx")
        return dirs[0], dirs[1], ups, dels

    def _apply(self, spark, d, ups, dels):
        return apply_updates(spark, d, upserts=ups, deletes=dels,
                             batch_id="b1", n_buckets=2)

    def test_crash_before_commit_after_adoption(self, spark, pair,
                                                monkeypatch):
        clean, crashy, ups, dels = pair
        self._apply(spark, clean, ups, dels)

        real_save = mf.save_config
        calls = {"n": 0}

        def exploding_save(index_dir, config):
            if index_dir == crashy and "b1" in str(
                    config.get("delta_batches", "")):
                calls["n"] += 1
                if calls["n"] == 1:
                    raise RuntimeError("simulated crash at commit")
            real_save(index_dir, config)

        monkeypatch.setattr(mf, "save_config", exploding_save)
        with pytest.raises(RuntimeError, match="simulated crash"):
            self._apply(spark, crashy, ups, dels)
        # tombstones + adopted segment files exist, batch unrecorded
        monkeypatch.undo()
        res = self._apply(spark, crashy, ups, dels)
        assert res["skipped"] is False
        assert _state(spark, crashy) == _state(spark, clean)

    def test_crash_after_tombstones_before_segment(self, spark, pair,
                                                   monkeypatch):
        clean, crashy, ups, dels = pair
        self._apply(spark, clean, ups, dels)

        real_build = incr.build_index
        calls = {"n": 0}

        def exploding_build(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("simulated crash in segment build")
            return real_build(*a, **kw)

        monkeypatch.setattr(incr, "build_index", exploding_build)
        with pytest.raises(RuntimeError, match="simulated crash"):
            self._apply(spark, crashy, ups, dels)
        monkeypatch.undo()
        res = self._apply(spark, crashy, ups, dels)
        assert res["skipped"] is False
        assert _state(spark, crashy) == _state(spark, clean)

    def test_crash_after_commit_heals_cache(self, spark, pair,
                                            monkeypatch):
        clean, crashy, ups, dels = pair
        self._apply(spark, clean, ups, dels)

        calls = {"n": 0}
        real_write = incr._write_corpus_stats

        def exploding_cache(index_dir, n_docs, total_dl):
            if index_dir == crashy:
                calls["n"] += 1
                if calls["n"] == 1:
                    raise RuntimeError("simulated crash at cache write")
            real_write(index_dir, n_docs, total_dl)

        monkeypatch.setattr(incr, "_write_corpus_stats", exploding_cache)
        with pytest.raises(RuntimeError, match="simulated crash"):
            self._apply(spark, crashy, ups, dels)
        monkeypatch.undo()
        res = self._apply(spark, crashy, ups, dels)
        assert res["skipped"] is True    # batch committed before crash
        # the derived parquet cache was healed on the skip path
        corpus = pd.read_parquet(os.path.join(crashy, "corpus_stats"))
        cfg = mf.load_config(crashy)
        assert int(corpus.iloc[0]["n_docs"]) == cfg["corpus"]["n_docs"]
        assert _state(spark, crashy) == _state(spark, clean)


class TestStreamingOpOrder:
    """Per-key op collapse inside a micro-batch (ADVICE round 1,
    streaming.py:52): an ordered changelog nets to its final state."""

    def _run(self, spark, tmp_path, ops):
        from moera_search_spark.streaming import stream_updates

        root = tmp_path
        idx_dir = str(root / "index")
        base = _transcripts(spark, [
            ("conv-a", 0, "original alpha text"),
            ("conv-b", 0, "original beta text"),
            ("conv-c", 0, "original gamma text"),
        ])
        build_index(spark, base, idx_dir, n_buckets=2)
        pdf = pd.DataFrame(
            ops, columns=["conv_id", "turn_idx", "text", "op", "seq"])
        pdf["role"] = "user"
        pdf["tool"] = None
        pdf["ts"] = pd.Timestamp(TS)
        chg = spark.createDataFrame(
            pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts",
                 "op", "seq"]],
            TRANSCRIPT_DDL + ", op string, seq long")
        changelog = str(root / "chg")
        chg.coalesce(1).write.mode("overwrite").parquet(changelog)
        stream_updates(spark, idx_dir, changelog,
                       checkpoint_dir=str(root / "ckpt"),
                       n_buckets=2, timeout_sec=300)
        idx = FTSIndex(spark, idx_dir)
        return {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in idx.live_docs.collect()
        }

    def test_delete_then_unchanged_upsert_nets_nochange(self, spark,
                                                        tmp_path):
        live = self._run(spark, tmp_path, [
            ("conv-a", 0, "", "delete", 1),
            ("conv-a", 0, "original alpha text", "upsert", 2),
        ])
        assert live[("conv-a", 0)] == "original alpha text"
        assert len(live) == 3

    def test_upsert_then_delete_nets_deleted(self, spark, tmp_path):
        live = self._run(spark, tmp_path, [
            ("conv-b", 0, "changed beta text", "upsert", 1),
            ("conv-b", 0, "", "delete", 2),
        ])
        assert ("conv-b", 0) not in live
        assert len(live) == 2

    def test_duplicate_upserts_single_live_doc(self, spark, tmp_path):
        live = self._run(spark, tmp_path, [
            ("conv-c", 0, "first revision", "upsert", 1),
            ("conv-c", 0, "second revision", "upsert", 2),
            ("conv-c", 0, "final revision", "upsert", 3),
        ])
        assert live[("conv-c", 0)] == "final revision"
        assert len(live) == 3


class TestNullConvId:
    def test_build_fails_loudly_on_null_conv_id(self, spark, tmp_path):
        pdf = pd.DataFrame({
            "conv_id": ["conv-a", None, "conv-b"],
            "turn_idx": [0, 0, 0],
            "role": "user", "text": "some text", "tool": None,
            "ts": pd.Timestamp(TS),
        })
        df = spark.createDataFrame(
            pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
            TRANSCRIPT_DDL)
        with pytest.raises(Exception, match="null conv_id"):
            build_index(spark, df, str(tmp_path / "nulls"), n_buckets=2)


class TestSourceAdapter:
    def test_parquet_dir_and_catalog_table(self, spark, tmp_path):
        from moera_search_spark.io import read_transcripts

        df = _transcripts(spark, [("conv-a", 0, "alpha"),
                                  ("conv-b", 0, "beta")])
        p = str(tmp_path / "tr")
        df.write.parquet(p)
        got = read_transcripts(spark, p)
        assert got.count() == 2
        df.createOrReplaceTempView("transcripts_view")
        got2 = read_transcripts(spark, "transcripts_view")
        assert got2.count() == 2

    def test_explicit_format(self, spark, tmp_path):
        from moera_search_spark.io import read_transcripts

        df = _transcripts(spark, [("conv-a", 0, "alpha")])
        p = str(tmp_path / "trf")
        df.write.parquet(p)
        assert read_transcripts(spark, p, fmt="parquet").count() == 1

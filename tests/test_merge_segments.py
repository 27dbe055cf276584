"""Tiered segment merge: consolidating delta segments without touching
the base index (the Lucene background-merge analogue; reference's index
lifecycle: index/Index.java:131-224 + OpenSearch's implicit segment
merging).  Pins:

* pure-insert merges are invisible to queries (bit-identical scores);
* merges with deletes equal an index where the surviving delta docs
  were applied as ONE batch (df exactness restored for delta postings);
* the base index files are never rewritten (cost ∝ delta size);
* delta-side tombstones are reclaimed, base-side kept;
* exactly-once batch dedup survives the lineage collapse (and
  compaction);
* a crash at any point inside the swap rolls back to the exact
  pre-merge index via recover();
* positional (phrase) indexes merge correctly.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from moera_search_spark import incremental as incr
from moera_search_spark import manifest as mf
from moera_search_spark.build import build_index
from moera_search_spark.incremental import (apply_updates, merge_segments,
                                            recover)
from moera_search_spark.query import FTSIndex

QUERIES = ["spark shuffle partition", "the system", "runs", "term1847"]
BASE_HI = "conv-00000080"      # base: convs 0..79
D1_HI = "conv-00000100"        # batch 1: convs 80..99
DEL_LO = "conv-00000100"       # deletes: convs 100..109 (delta side)
DEL_HI = "conv-00000110"
BASE_DEL_HI = "conv-00000002"  # deletes: convs 0..1 (base side)


def topk(idx, q, method="exhaustive", k=10):
    return [(int(r["doc_id"]), float(r["score"]))
            for r in idx.search(q, k=k, method=method).collect()]


def allk(idx):
    return {(q, m): topk(idx, q, m)
            for q in QUERIES for m in ("exhaustive", "pruned")}


def seg_files(idx_dir):
    out = []
    for sub in incr.SEG_SUBDIRS + (incr.TOMBSTONES,):
        for r, _d, files in os.walk(os.path.join(idx_dir, sub)):
            out.extend(
                os.path.relpath(os.path.join(r, f), idx_dir)
                for f in files
                if (f.startswith("seg-") or f.startswith("batch-"))
                and f.endswith(".parquet"))
    return sorted(out)


def base_file_stats(idx_dir):
    """(path, mtime_ns, size) of every NON-segment parquet file."""
    out = []
    for sub in incr.SEG_SUBDIRS + ("term_stats",):
        for r, _d, files in os.walk(os.path.join(idx_dir, sub)):
            for f in sorted(files):
                if f.endswith(".parquet") and not f.startswith("seg-"):
                    st = os.stat(os.path.join(r, f))
                    out.append((os.path.join(r, f), st.st_mtime_ns,
                                st.st_size))
    return out


@pytest.fixture(scope="module")
def menv(spark, corpus_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    base = corpus_df.filter(F.col("conv_id") < BASE_HI)
    d1 = corpus_df.filter((F.col("conv_id") >= BASE_HI)
                          & (F.col("conv_id") < D1_HI))
    d2 = corpus_df.filter(F.col("conv_id") >= D1_HI)
    n_base = base.count()

    # --- scenario A: pure inserts ------------------------------------
    a_dir = str(root / "inserts")
    build_index(spark, base, a_dir, n_buckets=4)
    apply_updates(spark, a_dir, upserts=d1, batch_id="b1", n_buckets=2)
    apply_updates(spark, a_dir, upserts=d2, batch_id="b2", n_buckets=2)
    a_pre = allk(FTSIndex(spark, a_dir))
    a_segs_pre = seg_files(a_dir)
    a_base_pre = base_file_stats(a_dir)
    a_res = merge_segments(spark, a_dir)
    a_post = allk(FTSIndex(spark, a_dir))

    # --- scenario B: inserts + deletes on both sides ------------------
    dels = corpus_df.filter(
        ((F.col("conv_id") >= DEL_LO) & (F.col("conv_id") < DEL_HI))
        | (F.col("conv_id") < BASE_DEL_HI)
    ).select("conv_id", "turn_idx")
    b_dir = str(root / "deletes")
    build_index(spark, base, b_dir, n_buckets=4)
    apply_updates(spark, b_dir, upserts=d1.unionByName(d2),
                  batch_id="b1", n_buckets=2)
    apply_updates(spark, b_dir, deletes=dels, batch_id="b2")
    b_snapshot = str(root / "deletes_premerge")
    shutil.copytree(b_dir, b_snapshot)
    b_pre = allk(FTSIndex(spark, b_dir))
    b_res = merge_segments(spark, b_dir)
    b_post = allk(FTSIndex(spark, b_dir))

    # reference: surviving delta docs applied as ONE batch over the
    # same base, base-side deletes tombstoned the same way
    survivors = (d1.unionByName(d2)
                 .join(dels, ["conv_id", "turn_idx"], "left_anti"))
    ref_dir = str(root / "deletes_ref")
    build_index(spark, base, ref_dir, n_buckets=4)
    apply_updates(spark, ref_dir, upserts=survivors,
                  deletes=dels.filter(F.col("conv_id") < BASE_DEL_HI),
                  batch_id="one-shot", n_buckets=2)
    b_ref = allk(FTSIndex(spark, ref_dir))

    return {
        "root": root, "n_base": n_base,
        "a_dir": a_dir, "a_pre": a_pre, "a_post": a_post, "a_res": a_res,
        "a_segs_pre": a_segs_pre, "a_base_pre": a_base_pre,
        "b_dir": b_dir, "b_pre": b_pre, "b_post": b_post, "b_res": b_res,
        "b_ref": b_ref, "b_snapshot": b_snapshot,
        "n_survivors": survivors.count(),
    }


class TestPureInsertMerge:
    def test_scores_bit_identical(self, menv):
        assert menv["a_post"] == menv["a_pre"]

    def test_consolidates_files(self, menv):
        after = seg_files(menv["a_dir"])
        assert len(after) < len(menv["a_segs_pre"])
        cfg = mf.load_config(menv["a_dir"])
        assert len(cfg["delta_batches"]) == 1
        assert set(cfg["delta_batches"][0]["merged"]) == {"b1", "b2"}

    def test_base_files_untouched(self, menv):
        assert base_file_stats(menv["a_dir"]) == menv["a_base_pre"]

    def test_remerge_is_noop(self, spark, menv):
        res = merge_segments(spark, menv["a_dir"])
        assert res["skipped"] and res["reason"] == "already merged"

    def test_merge_without_batches_is_noop(self, spark, corpus_df,
                                           tmp_path_factory):
        d = str(tmp_path_factory.mktemp("mergenoop") / "idx")
        build_index(spark, corpus_df.filter(F.col("conv_id") < "conv-00000010"),
                    d, n_buckets=2)
        res = merge_segments(spark, d)
        assert res["skipped"] and res["reason"] == "no delta batches"


class TestMergeWithDeletes:
    def test_equals_single_batch_index(self, menv):
        assert menv["b_post"] == menv["b_ref"]

    def test_no_dead_or_out_of_range_doc_surfaces(self, spark, menv):
        # post-merge hits must hydrate to live keys only — never a
        # deleted conv, never a doc_id outside the re-densified range
        idx = FTSIndex(spark, menv["b_dir"])
        nxt = mf.load_config(menv["b_dir"])["next_doc_id"]
        for q in QUERIES:
            for r in idx.search(q, k=10, hydrate=True).collect():
                assert int(r["doc_id"]) < nxt
                assert not (DEL_LO <= r["conv_id"] < DEL_HI)
                assert not (r["conv_id"] < BASE_DEL_HI)

    def test_delta_tombstones_reclaimed(self, spark, menv):
        tomb = spark.read.parquet(
            os.path.join(menv["b_dir"], incr.TOMBSTONES))
        assert tomb.filter(
            F.col("doc_id") >= menv["n_base"]).count() == 0
        assert tomb.count() == menv["b_res"]["base_tombstones_kept"]

    def test_doc_ids_redensified(self, menv):
        cfg = mf.load_config(menv["b_dir"])
        assert cfg["next_doc_id"] == menv["n_base"] + menv["n_survivors"]
        assert cfg["delta_batches"][0]["first_doc_id"] == menv["n_base"]

    def test_replayed_premerge_batch_still_deduped(self, spark, menv,
                                                   corpus_df):
        d1 = corpus_df.filter((F.col("conv_id") >= BASE_HI)
                              & (F.col("conv_id") < D1_HI))
        res = apply_updates(spark, menv["b_dir"], upserts=d1,
                            batch_id="b1", n_buckets=2)
        assert res["skipped"] is True


class TestCrashRecovery:
    def _crashy_merge(self, spark, d, monkeypatch, fail_at):
        if fail_at == "adopt":
            def boom(*a, **k):
                raise RuntimeError("simulated crash during adoption")
            monkeypatch.setattr(incr, "_adopt_segment_files", boom)
        else:   # fail at the commit save (pending_merge being cleared)
            real_save = mf.save_config

            def boom_save(index_dir, config):
                if (index_dir == d and "pending_merge" not in config
                        and config.get("delta_batches")
                        and str(config["delta_batches"][0]["batch_id"])
                        .startswith("_merge.")):
                    raise RuntimeError("simulated crash at commit")
                real_save(index_dir, config)
            monkeypatch.setattr(mf, "save_config", boom_save)
        with pytest.raises(RuntimeError, match="simulated crash"):
            merge_segments(spark, d)
        monkeypatch.undo()

    @pytest.mark.parametrize("fail_at", ["adopt", "commit"])
    def test_rollback_then_redo(self, spark, menv, monkeypatch, fail_at,
                                tmp_path_factory):
        d = str(tmp_path_factory.mktemp(f"crash_{fail_at}") / "idx")
        shutil.copytree(menv["b_snapshot"], d)
        self._crashy_merge(spark, d, monkeypatch, fail_at)

        # a half-merged index refuses to open...
        with pytest.raises(RuntimeError, match="interrupted segment merge"):
            FTSIndex(spark, d)
        # ...rolls back to the exact pre-merge state...
        rb = recover(d)
        assert rb["rolled_back"] is True
        assert allk(FTSIndex(spark, d)) == menv["b_pre"]
        assert seg_files(d) == seg_files(menv["b_snapshot"])
        # ...and the redo lands the same post-merge index
        res = merge_segments(spark, d)
        assert not res["skipped"]
        assert allk(FTSIndex(spark, d)) == menv["b_post"]

    def test_apply_updates_autoheals(self, spark, menv, monkeypatch,
                                     corpus_df, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("crash_apply") / "idx")
        shutil.copytree(menv["b_snapshot"], d)
        self._crashy_merge(spark, d, monkeypatch, "adopt")
        extra = corpus_df.filter(F.col("conv_id") < "conv-00000001") \
            .withColumn("text", F.lit("freshly healed content"))
        res = apply_updates(spark, d, upserts=extra, batch_id="b-heal",
                            n_buckets=2)
        assert res["skipped"] is False
        assert mf.load_config(d).get("pending_merge") is None


class TestPositionalMerge:
    PHRASE = "zebra stability matrix"

    def test_phrase_after_merge(self, spark, corpus_df, tmp_path_factory):
        import pandas as pd

        root = tmp_path_factory.mktemp("mergepos")
        base = corpus_df.filter(F.col("conv_id") < "conv-00000030")
        ts = pd.Timestamp("2026-02-01").to_pydatetime()
        rows = [(f"convP-{i}", 0, "user",
                 f"filler number {i} then zebra stability matrix closes",
                 None, ts) for i in range(3)]
        ups = spark.createDataFrame(rows, corpus_df.schema)

        d = str(root / "idx")
        build_index(spark, base, d, n_buckets=2, positions=True)
        apply_updates(spark, d, upserts=ups, batch_id="p1", n_buckets=2)
        dels = spark.createDataFrame([("convP-1", 0)],
                                     "conv_id string, turn_idx int")
        apply_updates(spark, d, deletes=dels, batch_id="p2")
        res = merge_segments(spark, d)
        assert not res["skipped"] and res["docs_merged"] == 2

        ref = str(root / "ref")
        build_index(spark, base, ref, n_buckets=2, positions=True)
        apply_updates(spark, ref,
                      upserts=ups.filter(F.col("conv_id") != "convP-1"),
                      batch_id="one", n_buckets=2)

        got = [(int(r["doc_id"]), float(r["score"])) for r in
               FTSIndex(spark, d).search_phrase(self.PHRASE, k=10).collect()]
        want = [(int(r["doc_id"]), float(r["score"])) for r in
                FTSIndex(spark, ref).search_phrase(self.PHRASE,
                                                   k=10).collect()]
        assert got == want and len(got) == 2


class TestReservedPrefixes:
    def test_user_batch_cannot_wear_merge_prefix(self, spark, menv,
                                                 corpus_df):
        with pytest.raises(ValueError, match="reserved prefix"):
            apply_updates(spark, menv["a_dir"],
                          upserts=corpus_df.limit(1),
                          batch_id="_merge.nightly")
        with pytest.raises(ValueError, match="reserved prefix"):
            apply_updates(spark, menv["a_dir"],
                          upserts=corpus_df.limit(1),
                          batch_id="_compact.x")


class TestDeleteOnlyConsolidation:
    def test_tombstone_batches_collapse(self, spark, corpus_df,
                                        tmp_path_factory):
        d = str(tmp_path_factory.mktemp("delonly") / "idx")
        build_index(spark, corpus_df.filter(F.col("conv_id") < BASE_HI),
                    d, n_buckets=2)
        for i, conv in enumerate(["conv-00000003", "conv-00000004",
                                  "conv-00000005"]):
            dels = (corpus_df.filter(F.col("conv_id") == conv)
                    .select("conv_id", "turn_idx"))
            apply_updates(spark, d, deletes=dels, batch_id=f"del-{i}")
        n_before = FTSIndex(spark, d).n_docs
        tomb_files = os.listdir(os.path.join(d, incr.TOMBSTONES))
        assert len([f for f in tomb_files if f.endswith(".parquet")]) == 3

        res = merge_segments(spark, d)
        assert not res["skipped"] and res["docs_merged"] == 0
        cfg = mf.load_config(d)
        assert len(cfg["delta_batches"]) == 1
        assert set(cfg["delta_batches"][0]["merged"]) \
            == {"del-0", "del-1", "del-2"}
        tomb_files = [f for f in os.listdir(os.path.join(d, incr.TOMBSTONES))
                      if f.endswith(".parquet")]
        assert len(tomb_files) == 1   # consolidated
        idx = FTSIndex(spark, d)
        assert idx.n_docs == n_before
        assert idx.live_docs.filter(
            F.col("conv_id") == "conv-00000004").count() == 0
        # nothing left to do
        assert merge_segments(spark, d)["skipped"]


class TestEmptyBasePlaceholders:
    def test_merge_to_empty_and_back(self, spark, corpus_df,
                                     tmp_path_factory):
        """Empty standalone base → delta docs → delete them all →
        merge (index must still open via token-named placeholders) →
        new delta (adoption must drop the placeholder again)."""
        d = str(tmp_path_factory.mktemp("emptybase") / "idx")
        blank = (corpus_df.filter(F.col("conv_id") < "conv-00000005")
                 .withColumn("text", F.lit("the of and")))  # stopwords only
        build_index(spark, blank, d, n_buckets=2, allow_empty=True)

        ups = corpus_df.filter((F.col("conv_id") >= "conv-00000005")
                               & (F.col("conv_id") < "conv-00000008"))
        apply_updates(spark, d, upserts=ups, batch_id="u1", n_buckets=2)
        assert FTSIndex(spark, d).search("the system", k=5) is not None
        apply_updates(spark, d,
                      deletes=ups.select("conv_id", "turn_idx"),
                      batch_id="d1")
        res = merge_segments(spark, d)
        assert not res["skipped"] and res["docs_merged"] == 0
        idx = FTSIndex(spark, d)   # opens via placeholders
        assert idx.search("the system", k=5).collect() == []

        apply_updates(spark, d, upserts=ups, batch_id="u2", n_buckets=2)
        hits = FTSIndex(spark, d).search("the system", k=5).collect()
        assert hits
        # the placeholder must be gone once real hive files exist
        root_files = [f for f in os.listdir(os.path.join(d, "postings"))
                      if f.endswith("-placeholder.parquet")]
        assert root_files == []


class TestStreamAutoMerge:
    def test_merge_every_policy(self, spark, corpus_df, tmp_path_factory):
        from moera_search_spark.streaming import stream_updates

        root = tmp_path_factory.mktemp("stream_automerge")
        idx_dir = str(root / "idx")
        changelog = str(root / "changelog")
        checkpoint = str(root / "ckpt")
        build_index(spark, corpus_df.filter(F.col("conv_id") < "conv-00000020"),
                    idx_dir, n_buckets=2)

        def log(lo, hi):
            (corpus_df.filter((F.col("conv_id") >= lo)
                              & (F.col("conv_id") < hi))
             .select("conv_id", "turn_idx", "role", "text", "tool", "ts",
                     F.lit("upsert").alias("op"))
             .write.mode("append").parquet(changelog))

        log("conv-00000020", "conv-00000025")
        stream_updates(spark, idx_dir, changelog, checkpoint_dir=checkpoint,
                       n_buckets=2, timeout_sec=300, merge_every=2)
        assert len(mf.load_config(idx_dir)["delta_batches"]) == 1  # no merge yet

        log("conv-00000025", "conv-00000030")
        stream_updates(spark, idx_dir, changelog, checkpoint_dir=checkpoint,
                       n_buckets=2, timeout_sec=300, merge_every=2)
        cfg = mf.load_config(idx_dir)
        assert len(cfg["delta_batches"]) == 1
        assert str(cfg["delta_batches"][0]["batch_id"]).startswith("_merge.")
        # merged index answers over the whole streamed corpus
        idx = FTSIndex(spark, idx_dir)
        assert idx.n_docs == corpus_df.filter(
            F.col("conv_id") < "conv-00000030").count()
        assert idx.search("the system", k=5).collect()

        # the synthetic merged entry must NOT count toward the policy:
        # one more batch leaves [merged, new] unmerged-count 1 < 2
        log("conv-00000030", "conv-00000035")
        stream_updates(spark, idx_dir, changelog, checkpoint_dir=checkpoint,
                       n_buckets=2, timeout_sec=300, merge_every=2)
        cfg = mf.load_config(idx_dir)
        assert len(cfg["delta_batches"]) == 2
        assert str(cfg["delta_batches"][0]["batch_id"]).startswith("_merge.")
        assert not str(cfg["delta_batches"][1]["batch_id"]).startswith("_merge.")


class TestCompactCarriesLineage:
    def test_precompact_batch_replay_is_noop(self, spark, corpus_df,
                                             tmp_path_factory):
        from moera_search_spark.incremental import compact

        d = str(tmp_path_factory.mktemp("compactdedup") / "idx")
        base = corpus_df.filter(F.col("conv_id") < "conv-00000020")
        extra = corpus_df.filter((F.col("conv_id") >= "conv-00000020")
                                 & (F.col("conv_id") < "conv-00000025"))
        build_index(spark, base, d, n_buckets=2)
        apply_updates(spark, d, upserts=extra, batch_id="bx", n_buckets=2)
        compact(spark, d)
        res = apply_updates(spark, d, upserts=extra, batch_id="bx",
                            n_buckets=2)
        assert res["skipped"] is True

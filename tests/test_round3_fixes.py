"""Round-3 correctness fixes, each pinned by a regression test:

* pruned-path θ admissibility under negative idf with MULTIPLE
  pseudo-chunks: docs whose blocks straddle a seed pseudo-chunk used
  to be scored partially; with a negative-idf term omitted, the
  partial score EXCEEDS the full one, inflating θ and the final merge
  (ADVICE round 2 medium, query.py);
* recompute's generation-pointer swap — the output path resolves a
  complete generation at every instant (the two-rename swap had a
  reader-visible gap);
* FTSIndex restores the session AQE setting on close() instead of
  leaving it off for unrelated workloads;
* batch-id filesystem tokens — one batch id can never be a file
  prefix of another ('b1' retry sweep must not delete 'b1-retry'
  segments);
* streaming per-key collapse decides seq-vs-ts ordering per batch and
  fails loudly on mixed seq presence.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moera_search_spark.build import build_index
from moera_search_spark.incremental import (
    _cleanup_batch_artifacts,
    _fs_token,
    apply_updates,
)
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


class TestPrunedThetaMultiPc:
    """The engineered inflation scenario (G = 64, chunk_size = 256):

    * doc 5  (pc 0): 'bravo bravo bravo'            — top seed anchor
    * doc 30 (pc 0): 'bravo' + 4 filler tokens      — the true #2
    * doc 64 (pc 1): 'bravo alpha'                  — alpha idf < 0
    * docs 70..199: 'alpha waste', all deleted      — df(alpha) = 131
      while N drops to 32, so idf(alpha) = ln(1 − 99.5/131.5) < 0
    * docs 31..63, 65..69 deleted too (keeps N small → idf strongly
      negative, and puts doc 64 alone in pc 1)

    With seed_chunks=1 the seed is pc 0.  Pre-fix, doc 64 entered the
    seed pass through bravo's block [5, 30, 64] (which straddles
    pc 0/pc 1) WITHOUT its alpha block → partial score
    idf_b·tfnorm(64) > full(64) = partial + idf_a·tfnorm_a, and the
    final max-merge kept the inflated partial, ranking doc 64 above
    doc 30.  Post-fix each pass keeps only docs whose own pc it
    covers, every retained score is full, and pruned == exhaustive.
    """

    @pytest.fixture(scope="class")
    def idx(self, spark, tmp_path_factory):
        rows = []
        for i in range(200):
            if i == 5:
                text = "bravo bravo bravo"
            elif i == 30:
                text = "bravo filler filler filler filler"
            elif i == 64:
                text = "bravo alpha"
            elif i >= 70:
                text = "alpha waste"
            else:
                text = "filler stuff"
            rows.append((f"conv-{i:04d}", 0, text))
        idx_dir = str(tmp_path_factory.mktemp("negidf_pc") / "idx")
        build_index(spark, _transcripts(spark, rows), idx_dir,
                    n_buckets=4, chunk_size=256, block_size=4)
        doomed = [(f"conv-{i:04d}", 0, "") for i in range(31, 64)]
        doomed += [(f"conv-{i:04d}", 0, "") for i in range(65, 70)]
        doomed += [(f"conv-{i:04d}", 0, "") for i in range(70, 200)]
        apply_updates(spark, idx_dir,
                      deletes=_transcripts(spark, doomed)
                      .select("conv_id", "turn_idx"),
                      batch_id="mass_delete")
        return FTSIndex(spark, idx_dir)

    def _pruned_topk(self, idx, q, k, seed_chunks, dynamic=False):
        terms = idx.query_terms(q)
        idf = idx.idf_map(terms)
        matched = [t for t in terms if t in idf]
        postings = idx._postings_for(matched)
        if dynamic:
            scored = idx._pruned_scored_dynamic(
                postings, idf, None, k, seed_chunks,
                max(64, idx.chunk_size // 32))
        else:
            scored = idx._pruned_scored(postings, idf, None, k,
                                        seed_chunks=seed_chunks)
        return [(int(r["doc_id"]), round(float(r["score"]), 10))
                for r in scored.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k).collect()]

    def _exhaustive_topk(self, idx, q, k):
        return [(int(r["doc_id"]), round(float(r["score"]), 10))
                for r in idx.search(q, k=k,
                                    method="exhaustive").collect()]

    def test_setup_preconditions(self, idx):
        idf = idx.idf_map(idx.query_terms("alpha"))
        assert idf["alpha"] < 0, "alpha idf must be negative"
        assert idx.n_docs == 32
        # doc 64 sits in a different pseudo-chunk than the seed anchor
        assert 64 // 64 != 5 // 64

    def test_pruned_rank_identical_with_straddling_blocks(self, idx):
        want = self._exhaustive_topk(idx, "bravo alpha", 2)
        # the scenario is sharp: the true #2 is doc 30, which the
        # inflated partial score of doc 64 used to displace
        assert [d for d, _ in want] == [5, 30]
        for dynamic in (False, True):
            got = self._pruned_topk(idx, "bravo alpha", 2,
                                    seed_chunks=1, dynamic=dynamic)
            assert got == want, f"dynamic={dynamic}"

    def test_pruned_rank_identical_across_k_and_seeds(self, idx):
        for q in ("bravo alpha", "alpha", "bravo filler alpha"):
            for k in (1, 2, 3, 5):
                for seeds in (1, 2):
                    for dyn in (False, True):
                        assert self._pruned_topk(
                            idx, q, k, seeds, dynamic=dyn) == \
                            self._exhaustive_topk(idx, q, k), \
                            (q, k, seeds, dyn)

    def test_batched_pruned_strict_regime(self, idx):
        """Round-4 batched path on the SAME engineered corpus: a
        negative-idf query inside a ``search_many`` batch must apply
        the strict own-pc restriction per query — doc 64's inflated
        partial score must not displace doc 30 in the batched output
        either, while the non-strict sibling query stays untouched."""
        idf = idx.idf_map(["alpha"])
        assert idf["alpha"] < 0
        texts = ["bravo alpha", "bravo", "alpha"]
        idx.PRUNE_MIN_FRACTION = -1.0
        try:
            got = idx.search_many(texts, k=3,
                                  method="pruned").collect()
        finally:
            del idx.PRUNE_MIN_FRACTION
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), round(float(r["score"]), 10)))
        for qi, text in enumerate(texts):
            assert by_q.get(qi, []) == \
                self._exhaustive_topk(idx, text, 3), (qi, text)
        # the sharp scenario itself: true order is 5, 30 then 64
        assert [d for d, _ in by_q[0]] == [5, 30, 64]

    def test_sidecar_engaged_and_fallback(self, idx, spark):
        import shutil

        # sidecar present on a fresh build (plus the delta segment's)
        assert idx._pc_bounds_pdf(["bravo"]) is not None
        # removing it falls back to the dynamic path transparently
        side = os.path.join(idx.index_dir, "pc_bounds")
        backup = side + ".bak"
        shutil.move(side, backup)
        try:
            assert idx._pc_bounds_pdf(["bravo"]) is None
            want = self._exhaustive_topk(idx, "bravo alpha", 2)
            assert self._pruned_topk(idx, "bravo alpha", 2, 1) == want
        finally:
            shutil.move(backup, side)


class TestAtomicGenerationSwap:
    def test_pointer_swap_leaves_no_gap_and_gcs(self, spark, tmp_path):
        from moera_search_spark.recompute import refresh_popularity

        events = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet")
        out = str(tmp_path / "stats")
        r1 = refresh_popularity(spark, events, out,
                                now_ms=1706745600000)
        path = r1["table"]
        assert os.path.islink(path)          # pointer, not a moved dir
        first_target = os.readlink(path)
        r2 = refresh_popularity(spark, events, out,
                                now_ms=1706745600000)
        assert os.path.islink(path)
        assert os.readlink(path) != first_target
        # previous generation GC'd, exactly one gen dir + the pointer
        sib = sorted(os.listdir(out))
        gens = [d for d in sib if ".gen-" in d]
        assert len(gens) == 1
        assert os.readlink(path) == gens[0]
        # readable through the plain path
        assert spark.read.parquet(path).count() > 0
        assert r2["table"] == path


class TestAqeRestore:
    def test_close_restores_prior_setting(self, spark, corpus_df,
                                          tmp_path):
        idx_dir = str(tmp_path / "aqe_idx")
        build_index(spark, corpus_df.limit(40), idx_dir, n_buckets=2)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        with FTSIndex(spark, idx_dir) as idx:
            assert spark.conf.get(
                "spark.sql.adaptive.enabled") == "false"
            idx.search("alpha", k=3).collect()
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


class TestBatchIdTokens:
    def test_token_never_a_prefix_of_another(self):
        ids = ["b1", "b1-retry", "b1-", "b1--x", "a/b", "a_b", "b12",
               "stream-0", "stream-01", "stream-0-1"]
        toks = [_fs_token(i) for i in ids]
        assert len(set(toks)) == len(toks)
        for i, ta in enumerate(toks):
            for j, tb in enumerate(toks):
                if i != j:
                    assert not (tb + "-").startswith(ta + "-"), \
                        (ids[i], ids[j])

    def test_retry_sweep_spares_sibling_batch(self, spark, tmp_path):
        rows = [(f"conv-{i:04d}", 0, f"token{i} text") for i in range(20)]
        idx_dir = str(tmp_path / "tok_idx")
        build_index(spark, _transcripts(spark, rows), idx_dir,
                    n_buckets=2)
        ups = _transcripts(spark, [("conv-zz01", 0, "sibling payload")])
        apply_updates(spark, idx_dir, upserts=ups, batch_id="b1-retry",
                      n_buckets=2)
        tok = _fs_token("b1-retry")
        seg_files = [os.path.join(r, f)
                     for r, _d, fs in os.walk(idx_dir) for f in fs
                     if f.startswith(f"seg-{tok}-")]
        assert seg_files, "sibling batch must have adopted segments"
        # a crashed-'b1' retry sweep must not touch them
        _cleanup_batch_artifacts(idx_dir, "b1")
        assert all(os.path.exists(f) for f in seg_files)
        idx = FTSIndex(spark, idx_dir)
        assert idx.search("sibling payload", k=1).count() == 1

    def test_empty_batch_id_rejected(self):
        with pytest.raises(ValueError):
            _fs_token("")


class TestFreshBuildIntoDirtyDir:
    def test_second_nonresume_build_starts_clean(self, spark, tmp_path):
        """A fresh build into a dir holding an older index must not
        inherit its manifest (stale 'done' marks skipped staging and
        committed an empty corpus) nor its tombstones/segments."""
        idx_dir = str(tmp_path / "dirty")
        rows1 = [(f"conv-{i:04d}", 0, f"first corpus {i}")
                 for i in range(30)]
        build_index(spark, _transcripts(spark, rows1), idx_dir,
                    n_buckets=2)
        apply_updates(spark, idx_dir,
                      deletes=_transcripts(
                          spark, [("conv-0001", 0, "")])
                      .select("conv_id", "turn_idx"),
                      batch_id="stale_del")
        rows2 = [(f"conv-{i:04d}", 0, f"second corpus {i}")
                 for i in range(20)]
        res = build_index(spark, _transcripts(spark, rows2), idx_dir,
                          n_buckets=2)
        assert res["n_docs"] == 20
        idx = FTSIndex(spark, idx_dir)
        assert idx.n_docs == 20
        assert idx.tombstones is None          # old tombstones wiped
        assert idx.search("second", k=5).count() > 0
        assert idx.search("first", k=5).count() == 0


class TestLshPersistDiscipline:
    def test_no_storage_growth_across_invocations(self, spark):
        from moera_search_spark.operators.dedup import dedup_minhash_lsh

        sf = "/root/testdata/sf0.001"
        dedup_minhash_lsh(spark, sf).collect()
        n1 = spark.sparkContext._jsc.getPersistentRDDs().size()
        for _ in range(2):
            dedup_minhash_lsh(spark, sf).collect()
        n2 = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert n2 <= n1     # one-generation cache: no accumulation


class TestMultimodalHashableTwin:
    def test_matches_raw_features(self, spark):
        from moera_search_spark.operators.multimodal import (
            multimodal_decode_features,
            multimodal_decode_features_hashable,
        )

        sf = "/root/testdata/sf0.001"
        raw = {int(r["doc_id"]): r["features"]
               for r in multimodal_decode_features(spark, sf).collect()}
        hashed = {int(r["doc_id"]): r["features_e6"]
                  for r in multimodal_decode_features_hashable(
                      spark, sf).collect()}
        assert set(raw) == set(hashed) and raw
        for d, feats in raw.items():
            got = [int(x) / 1e6 for x in hashed[d].split(",")]
            assert len(got) == len(feats)
            for g, f in zip(got, feats):
                assert abs(g - f) <= 1.5e-6   # e6 rounding granularity


class TestStreamingSeqPresence:
    def _changelog_row(self, conv, turn, text, op, seq):
        import datetime

        ts = datetime.datetime.fromisoformat(TS)
        return (conv, turn, "user", text, None, ts, op, seq)

    def test_mixed_seq_presence_fails_loudly(self, spark, tmp_path):
        from moera_search_spark.streaming import stream_updates

        rows = [(f"conv-{i:04d}", 0, f"word{i} base") for i in range(10)]
        idx_dir = str(tmp_path / "mix_idx")
        build_index(spark, _transcripts(spark, rows), idx_dir,
                    n_buckets=2)
        rows = [
            self._changelog_row("conv-0001", 0, "updated text",
                                "upsert", 5),
            self._changelog_row("conv-0002", 0, "other text",
                                "upsert", None),
        ]
        changelog = str(tmp_path / "mix_log")
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp, op string, "
                  "seq long").write.mode("append").parquet(changelog)
        with pytest.raises(Exception, match="mixes rows"):
            stream_updates(spark, idx_dir, changelog,
                           checkpoint_dir=str(tmp_path / "mix_ckpt"),
                           n_buckets=2, timeout_sec=120)


class TestEnsureParallelism:
    """Small-input parallelization (_parallel.py): a one-file scan is
    widened to the session's default parallelism so CPU-heavy
    row-local pipelines use every core; an already-wide frame passes
    through untouched (the no-op branch that makes the helper free at
    data scale)."""

    def test_narrow_scan_widened(self, spark, tmp_path):
        from moera_search_spark.operators._parallel import (
            ensure_parallelism,
        )

        p = str(tmp_path / "one_file")
        spark.range(100).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        assert df.rdd.getNumPartitions() == 1
        out = ensure_parallelism(df, key="id")
        assert (out.rdd.getNumPartitions()
                == spark.sparkContext.defaultParallelism)
        assert sorted(r.id for r in out.collect()) == list(range(100))

    def test_wide_frame_untouched(self, spark):
        from moera_search_spark.operators._parallel import (
            ensure_parallelism,
        )

        target = spark.sparkContext.defaultParallelism
        df = spark.range(1000).repartition(target + 4, "id")
        assert ensure_parallelism(df, key="id") is df


class TestTermBucketExprTwin:
    """The JVM crc32 expression the postings layout shuffle keys on
    must agree with the python term_bucket() the query path uses —
    a mismatch would scatter a term_bucket directory's rows across
    tasks (file-count blow-up) without failing any query."""

    def test_matches_python_on_mixed_terms(self, spark):
        from moera_search_spark.build import term_bucket, term_bucket_expr

        terms = ["run", "queri", "систем", "données", "naïve", "x",
                 "term1924", "ёлка", "a" * 300, "中文词", "mixé42_",
                 "", "🙂emoji"]
        df = spark.createDataFrame([(t,) for t in terms], "term string")
        got = {r["term"]: r["tb"] for r in
               df.select("term",
                         term_bucket_expr(16).alias("tb")).collect()}
        for t in terms:
            assert got[t] == term_bucket(t, 16), t

    def test_matches_across_bucket_counts(self, spark):
        from moera_search_spark.build import term_bucket, term_bucket_expr

        df = spark.createDataFrame([("stemm",), ("посад",)],
                                   "term string")
        for n in (1, 7, 16, 256):
            got = df.select(term_bucket_expr(n).alias("tb")).collect()
            assert [r["tb"] for r in got] == \
                [term_bucket("stemm", n), term_bucket("посад", n)]


class TestIndexParallelismInvariance:
    """The determinism contract: the same input yields the same index
    CONTENT at any build parallelism and any bucketing — blocks are
    canonical (term, chunk)-local regardless of how staging split the
    work.  This is what makes resume byte-identical and the scaling
    legs comparable (SCALE.md; verified at 973k docs old-vs-new
    pipeline during round 3 — this pins it at test scale forever)."""

    @staticmethod
    def _canon(spark, idx_dir):
        import pyspark.sql.functions as F

        post = (spark.read.parquet(f"{idx_dir}/postings")
                .select("term", "term_bucket", "first_doc_id",
                        "last_doc_id", "n_docs",
                        F.md5(F.hex("deltas")).alias("d"),
                        F.md5(F.hex("tfs")).alias("t"),
                        F.md5(F.hex("dls")).alias("l"),
                        F.round("max_tfnorm", 10).alias("m")))
        docs = (spark.read.parquet(f"{idx_dir}/docs")
                .select("doc_id", "conv_id", "turn_idx", "dl"))
        return (sorted(map(tuple, post.collect())),
                sorted(map(tuple, docs.collect())))

    def test_same_bytes_across_shuffle_partitions_and_buckets(
            self, spark, corpus_df, tmp_path):
        from moera_search_spark.build import build_index

        variants = [
            {"n_buckets": 4, "shuffle_partitions": 2},
            {"n_buckets": 4, "shuffle_partitions": 8},
            {"n_buckets": 16, "shuffle_partitions": 8},
        ]
        canons = []
        for i, kw in enumerate(variants):
            d = str(tmp_path / f"idx{i}")
            build_index(spark, corpus_df, d, **kw)
            canons.append(self._canon(spark, d))
        assert canons[0] == canons[1], \
            "index content varies with shuffle_partitions"
        assert canons[0] == canons[2], \
            "index content varies with bucket count"

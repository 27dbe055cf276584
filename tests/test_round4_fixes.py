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

    def test_filter_visibility_default(self, spark, duck):
        # retired for fts_phrase_match (late round 4): its coalesce-
        # default predicate shape is covered by filter_in_case_coalesce
        from moera_search_spark.operators.relational import (
            FILTER_VISIBILITY_DEFAULT_SQL, filter_visibility_default)

        _parity(spark, duck, filter_visibility_default,
                FILTER_VISIBILITY_DEFAULT_SQL)


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


class TestAutoBucketCount:
    """``n_buckets="auto"`` sizes the doc-bucket count from the corpus
    (round-4 size-curve finding: a fixed count lets per-task chunks
    grow linearly — 64 buckets cost ~13% at 9.7M turns vs 160)."""

    def test_knee_values(self):
        from moera_search_spark.build import (TARGET_TURNS_PER_BUCKET,
                                              auto_bucket_count)

        # the measured optima on the round-4 size curve
        assert auto_bucket_count(973_000, 16) == 64      # floor wins
        assert auto_bucket_count(3_900_000, 16) == 65    # ~= old 64
        assert auto_bucket_count(9_731_879, 16) == 163   # ~ the 160 win
        # floor: every task slot sees ~4 waves even on tiny corpora
        assert auto_bucket_count(100, 16) == 64
        assert auto_bucket_count(1, 2) == 8
        # cap: the validated 2^18 driver-bookkeeping bound — at the
        # 10^12-turn design point buckets grow to ~3.8M turns each
        # (SCALE.md §build), never the count
        assert TARGET_TURNS_PER_BUCKET == 60_000
        assert auto_bucket_count(10**12, 1000) == 2**18
        assert auto_bucket_count(2**18 * 60_000, 16) == 2**18

    def test_auto_build_matches_fixed(self, spark, corpus_df, tmp_path):
        from moera_search_spark import manifest as mf
        from moera_search_spark.build import auto_bucket_count, build_index
        from moera_search_spark.query import FTSIndex

        d_auto = str(tmp_path / "idx_auto")
        d_fixed = str(tmp_path / "idx_fixed")
        res = build_index(spark, corpus_df, d_auto, n_buckets="auto")
        expect = auto_bucket_count(
            corpus_df.count(), spark.sparkContext.defaultParallelism)
        # compute_boundaries dedupes quantile picks, so a tiny corpus
        # may realize fewer buckets than requested — but far more than
        # the non-auto default (32)
        got = mf.load_config(d_auto)["n_buckets"]
        assert expect * 0.8 <= got <= expect
        build_index(spark, corpus_df, d_fixed, n_buckets=4)
        a = FTSIndex(spark, d_auto).search("spark window join", k=10)
        b = FTSIndex(spark, d_fixed).search("spark window join", k=10)
        rows_a = [(r["doc_id"], round(r["score"], 9)) for r in a.collect()]
        rows_b = [(r["doc_id"], round(r["score"], 9)) for r in b.collect()]
        assert res["n_docs"] == corpus_df.count()
        assert rows_a == rows_b

    def test_compact_default_is_auto(self, spark, corpus_df, tmp_path):
        from moera_search_spark import manifest as mf
        from moera_search_spark.build import auto_bucket_count, build_index
        from moera_search_spark.incremental import compact
        from moera_search_spark.query import FTSIndex

        d = str(tmp_path / "idx_c")
        build_index(spark, corpus_df, d, n_buckets=4)
        before = [(r["doc_id"], round(r["score"], 9)) for r in
                  FTSIndex(spark, d).search("spark window", k=10).collect()]
        res = compact(spark, d)
        expect = auto_bucket_count(
            res["n_docs"], spark.sparkContext.defaultParallelism)
        assert mf.load_config(d)["n_buckets"] <= expect
        assert mf.load_config(d)["n_buckets"] > 4
        after = [(r["doc_id"], round(r["score"], 9)) for r in
                 FTSIndex(spark, d).search("spark window", k=10).collect()]
        assert before == after


class TestZeroTermDeltaBatch:
    """A delta batch whose changed docs ALL tokenize to zero terms
    (e.g. moderation blanks a few posts to whitespace/stopwords-only
    text) must COMMIT, not raise: apply_updates adopts tombstones for
    the replaced revisions BEFORE the segment builds, so the fresh-
    build zero-term failure (``allow_empty=False``) would strand the
    batch mid-apply — old revisions invisible, config commit never
    written, every retry failing identically (found by review,
    round 4)."""

    SCHEMA = ("conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")

    def test_blanking_batch_commits_and_replays(self, spark, tmp_path):
        import datetime as dt

        from moera_search_spark import manifest as mf
        from moera_search_spark.build import build_index
        from moera_search_spark.incremental import apply_updates, compact
        from moera_search_spark.query import FTSIndex

        ts = dt.datetime(2026, 1, 1)
        rows = [(f"c-{i:02d}", j, "user", "spark window join", None, ts)
                for i in range(4) for j in range(3)]
        idx_dir = str(tmp_path / "idx")
        build_index(spark, spark.createDataFrame(rows, self.SCHEMA),
                    idx_dir, n_buckets=2)
        assert FTSIndex(spark, idx_dir).search("spark", k=20).count() == 12

        blank = [("c-00", 0, "user", "the and of", None, ts),
                 ("c-01", 1, "user", "   ", None, ts)]
        res = apply_updates(
            spark, idx_dir,
            upserts=spark.createDataFrame(blank, self.SCHEMA),
            batch_id="b-blank", n_buckets=2)
        assert res["skipped"] is False
        assert res["docs_indexed"] == 2 and res["tombstoned"] == 2

        idx = FTSIndex(spark, idx_dir)
        # old revisions no longer match any query
        assert idx.search("spark", k=20).count() == 10
        # the blanked docs are LIVE (point-gettable) with dl = 0
        blanked = idx.live_docs.filter(
            "conv_id = 'c-00' and turn_idx = 0").collect()
        assert len(blanked) == 1 and blanked[0]["dl"] == 0
        assert idx.live_docs.count() == 12
        # corpus stats committed: 12 live docs, dl sum of the 10 full
        cfg = mf.load_config(idx_dir)
        assert cfg["corpus"]["n_docs"] == 12
        assert cfg["corpus"]["total_dl"] == 10 * 3

        # exactly-once replay: the batch is recorded, so a retry skips
        replay = apply_updates(
            spark, idx_dir,
            upserts=spark.createDataFrame(blank, self.SCHEMA),
            batch_id="b-blank", n_buckets=2)
        assert replay["skipped"] is True
        assert FTSIndex(spark, idx_dir).search("spark", k=20).count() == 10

        # compaction over the mixed live set (10 termful + 2 termless)
        compact(spark, idx_dir, n_buckets=2)
        idx2 = FTSIndex(spark, idx_dir)
        assert idx2.search("spark", k=20).count() == 10
        assert idx2.docs.filter("dl = 0").count() == 2

    def test_fresh_build_still_fails_loudly(self, spark, tmp_path):
        """allow_empty is the delta-segment contract only — a fresh
        standalone build of an all-empty corpus keeps the loud
        refusal (a term-less base index answers nothing and its
        postings dir has no files to open)."""
        import datetime as dt

        import pytest as _pytest

        from moera_search_spark.build import build_index

        ts = dt.datetime(2026, 1, 1)
        rows = [("c", j, "user", "the", None, ts) for j in range(3)]
        with _pytest.raises(ValueError, match="zero indexable terms"):
            build_index(spark, spark.createDataFrame(rows, self.SCHEMA),
                        str(tmp_path / "idx"), n_buckets=2)


class TestSplitEstimate:
    """ensure_parallelism's metadata-only split estimate must mirror
    Spark's FilePartition packing (maxSplitBytes from maxPartitionBytes
    / openCostInBytes / defaultParallelism), not a bare file count —
    Spark bin-packs small files, so N files is NOT N splits.  And the
    byte-size conf parser must accept Spark's suffixed forms ('16m',
    '64mb'), not just bare ints (found by review, round 4)."""

    def test_parse_bytes_suffixes(self):
        from moera_search_spark.operators._parallel import _parse_bytes

        d = 128 * 1024 * 1024
        assert _parse_bytes("134217728", d) == 134217728
        assert _parse_bytes("134217728b", d) == 134217728
        assert _parse_bytes("16m", d) == 16 * 1024 ** 2
        assert _parse_bytes("64mb", d) == 64 * 1024 ** 2
        assert _parse_bytes("128MB", d) == 128 * 1024 ** 2
        assert _parse_bytes("1g", d) == 1024 ** 3
        assert _parse_bytes("512k", d) == 512 * 1024
        assert _parse_bytes(" 2GB ", d) == 2 * 1024 ** 3
        assert _parse_bytes("garbage", d) == d
        assert _parse_bytes("", d) == d

    def test_estimate_matches_spark_packing(self, spark, tmp_path):
        """Two tiny files pack into 2 Spark partitions (each padded by
        openCost); the estimate must agree and the helper must widen.
        A single just-under-maxPartitionBytes file is 1 partition."""
        from moera_search_spark.operators._parallel import (
            _estimated_scan_partitions, ensure_parallelism)

        target = spark.sparkContext.defaultParallelism
        est = _estimated_scan_partitions(spark, [1024, 1024])
        assert est == 2
        p = str(tmp_path / "two_files")
        spark.range(100).repartition(2).write.parquet(p)
        df = spark.read.parquet(p)
        assert df.rdd.getNumPartitions() == est   # Spark agrees
        out = ensure_parallelism(df, key="id")
        assert out.rdd.getNumPartitions() == target
        assert sorted(r.id for r in out.collect()) == list(range(100))

    def test_nonfile_frame_fallback(self, spark):
        """Non-file-backed frames have no scan metadata — the helper
        falls back to the actual partition count (old behavior)
        instead of unconditionally passing narrow frames through."""
        from moera_search_spark.operators._parallel import (
            ensure_parallelism,
        )

        target = spark.sparkContext.defaultParallelism
        narrow = spark.range(1000).coalesce(1)
        out = ensure_parallelism(narrow, key="id")
        assert out.rdd.getNumPartitions() == target
        wide = spark.range(1000).repartition(target + 4, "id")
        assert ensure_parallelism(wide, key="id") is wide


class TestCompactBlankedCorpus:
    SCHEMA = TestZeroTermDeltaBatch.SCHEMA

    def test_compact_fully_blanked_corpus(self, spark, tmp_path):
        """compact() over a live corpus whose text was ALL blanked
        (legal via apply_updates) must succeed and leave an OPENABLE
        index: schema-only empty postings/pc_bounds, every doc live
        with dl=0, tombstones reclaimed, queries answering empty
        (found by review, round 4)."""
        import datetime as dt

        from moera_search_spark.build import build_index
        from moera_search_spark.incremental import apply_updates, compact
        from moera_search_spark.query import FTSIndex

        ts = dt.datetime(2026, 1, 1)
        rows = [(f"c-{i}", j, "user", "spark window join", None, ts)
                for i in range(2) for j in range(3)]
        idx_dir = str(tmp_path / "idx")
        build_index(spark, spark.createDataFrame(rows, self.SCHEMA),
                    idx_dir, n_buckets=2)
        blank = [(f"c-{i}", j, "user", "   ", None, ts)
                 for i in range(2) for j in range(3)]
        apply_updates(spark, idx_dir,
                      upserts=spark.createDataFrame(blank, self.SCHEMA),
                      batch_id="b-blank-all", n_buckets=2)
        res = compact(spark, idx_dir, n_buckets=2)
        assert res["n_docs"] == 6
        idx = FTSIndex(spark, idx_dir)
        assert idx.search("spark window", k=10).count() == 0
        assert idx.docs.filter("dl = 0").count() == 6
        assert idx.live_docs.count() == 6
        # compaction reclaimed the tombstones
        import os as _os
        tomb = _os.path.join(idx_dir, "tombstones")
        assert (not _os.path.isdir(tomb)) or not any(
            f.endswith(".parquet") for f in _os.listdir(tomb))


class TestReviewHardening:
    """Round-4 review findings: truncated-FLAC loudness and
    percent-encoded local paths in ensure_parallelism."""

    def test_flac_truncation_at_frame_boundary_raises(self):
        """A FLAC stream cut cleanly at a frame boundary passes every
        CRC yet carries fewer samples than STREAMINFO promises —
        decode must raise, not silently return a short array."""
        import numpy as np
        import pytest as _pytest

        from moera_search_spark.flac import decode_flac, encode_flac

        t = np.arange(192 * 40, dtype=np.float64)
        pcm = (2000 * np.sin(2 * np.pi * 440.0 * t / 8000)).astype(
            np.int16)[None, :]
        buf = encode_flac(pcm, 8000, blocksize=192)
        full, _ = decode_flac(buf)
        assert full.shape[1] == 192 * 40
        # frame starts are byte-aligned 14-bit sync 0x3FFE; scan for
        # candidates past the header and truncate at each — a clean
        # frame-boundary cut must raise the truncation error, a
        # mid-frame cut raises sync/CRC/EOF; none may return short
        start = buf.index(b"\xff\xf8", 4)
        cands = [i for i in range(start + 1, len(buf) - 1)
                 if buf[i] == 0xFF and (buf[i + 1] & 0xFC) == 0xF8]
        assert cands, "no frame-boundary candidates found"
        boundary_hits = 0
        for cut in cands[len(cands) // 2:len(cands) // 2 + 8]:
            try:
                out, _ = decode_flac(buf[:cut])
            except ValueError as e:
                boundary_hits += "truncated FLAC stream" in str(e)
            except EOFError:
                pass
            else:
                assert out.shape[1] == 192 * 40, \
                    "decode returned short without raising"
        assert boundary_hits >= 1

    def test_ensure_parallelism_percent_encoded_path(self, spark,
                                                     tmp_path):
        """inputFiles() percent-encodes local URIs (space -> %20);
        the helper must decode before the exists() probe or it
        silently skips the widening for such paths."""
        from moera_search_spark.operators._parallel import (
            ensure_parallelism,
        )

        target = spark.sparkContext.defaultParallelism
        p = str(tmp_path / "with space" / "tbl")
        spark.range(100).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        assert any("%20" in f for f in df.inputFiles())
        out = ensure_parallelism(df, key="id")
        assert out.rdd.getNumPartitions() == target
        assert sorted(r.id for r in out.collect()) == list(range(100))

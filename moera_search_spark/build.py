"""Distributed, checkpoint-resumable inverted-index build.

The Spark restatement of the reference's ingest path (reference:
scanner/updates/TimelineScanJob.java:114-186 pages the feed and
checkpoints a cursor per story; scanner/ingest/PostingIngest.java:77-202
assembles an IndexedDocument and writes it to the index at
index/Index.java:131-143, storing the engine-assigned documentId back):

    read transcripts → bucket by conv_id range → exact bucket counts
    (pins global doc_id offsets) → per-bucket staging (final doc ids +
    tokenize + pre-encoded posting runs, one Arrow pass) → global
    stats (N, avgdl, df) → run shuffle + canonical chunk-local block
    re-encode → postings/docs/stats tables

Scale design decisions (these are the 100-TB story, not test-size
conveniences):

* **Bucketing by conv_id range, not hash** — doc_ids come out dense and
  globally ordered by (conv_id, turn_idx) (the row invariant), each
  bucket is an independently checkpointable unit (manifest row), and a
  resumed build is byte-identical because bucket boundaries are pinned
  in ``_build_config.json``.
* **tf computed AND pre-encoded map-side** — term frequencies and doc
  lengths are emitted from one Arrow pass over each bucket, already
  varbyte-encoded as (term, chunk, bucket)-local posting *runs* with
  FINAL global doc_ids (an exact per-bucket count pre-pass pins the
  doc_id offsets in the config before staging starts).  Raw
  (doc, term, tf) rows — ~10× the corpus token count — never cross a
  shuffle or the Arrow boundary twice: the postings job shuffles
  compressed runs (~the index size), decodes them in one vectorized
  pass, and re-encodes canonical chunk-local blocks byte-identical to
  single-shot encoding.  At 10^12 turns this is the difference between
  shuffling ~a petabyte of token rows and shuffling ~the index.
* **Head-term skew** — postings are grouped by ``(term, chunk)`` where
  ``chunk = doc_id // chunk_size``: a stopword-like term occupying 30%
  of a 10^12-doc corpus is split across ~10^8 bounded-size groups
  instead of melting one reducer.  Group size ≤ chunk_size rows by
  construction — no AQE skew handling needed, no salting lottery.
* **Deterministic physical layout** — block boundaries are chunk-local,
  so the encoded index is invariant to partitioning/parallelism; the
  same input yields the same bytes at local[8] and local[32] (resume +
  scaling-efficiency comparisons are exact).
* **Partial agg for stats** — df is a plain groupBy aggregate
  (map-side partial combine; Catalyst handles two-phase agg); N/avgdl
  come free from the per-bucket staging counts (no extra scan).
* **Minimum job count** — every Spark job on a 1000-executor cluster
  pays scheduling + commit overhead, so the build is exactly six
  data jobs: boundary sampling, exact bucket counts (conv_id column
  only), staging write, term_stats (an agg over run METADATA — the
  per-run n_docs sums to df, no token rows are re-scanned), docs
  write (map-only — staging rows carry final doc_ids, so no join and
  no shuffle), postings re-encode+write (a (term, chunk)-keyed
  shuffle of compressed runs sized by shuffle_partitions — head-term
  groups spread across ALL tasks — then a cheap exchange of the
  encoded blocks onto the final (term_bucket, file-split) layout);
  plus one
  metadata-only job deriving the ``pc_bounds`` pruning sidecar from
  the written postings metadata columns (bytes per block, not the
  payloads).  ``repartitionByRange`` is never used after staging
  because its hidden sampling job re-executes upstream lineage (it
  would run the tokenizer twice).
* **Term-sharded postings layout** — postings are written
  ``partitionBy(term_bucket)`` with ``term_bucket = crc32(term) %
  n_term_buckets``: a query for T terms touches at most T directories
  (partition pruning on a 100-TB index), while the build-side shuffle
  key stays (term, chunk) so head terms still spread over all tasks.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Iterator

import pandas as pd

from . import manifest as mf
from .analyzer import doc_term_positions, doc_terms_tf, make_stemmer
from .postings import BLOCK_SIZE, CHUNK_SIZE, K1, B

STAGING_SCHEMA_DDL = (
    "bucket int, doc_id long, row_type string, conv_id string, "
    "turn_idx int, role string, tool string, ts timestamp, text string, "
    "dl int, term string, n_docs int, first_doc_id long, "
    "last_doc_id long, deltas binary, tfs binary, dls binary"
)

POSTINGS_SCHEMA_DDL = (
    "term string, term_bucket int, first_doc_id long, last_doc_id long, "
    "n_docs int, deltas binary, tfs binary, dls binary, max_tfnorm double"
)

# Positional postings (built only when build_index(positions=True)):
# the staging runs carry one extra varbyte blob per run — per-doc
# within-doc position deltas, concatenated in doc order.  ``tfs``
# doubles as the per-doc position COUNTS (tf is by definition the
# number of occurrences), so positions cost exactly one new column.
# The table keeps the run granularity (term, chunk, bucket) — phrase
# queries re-rank candidates from scratch, so the canonical block
# re-encode (block-max bounds, fixed block size) buys nothing here.
POSITIONS_SCHEMA_DDL = (
    "term string, term_bucket int, first_doc_id long, last_doc_id long, "
    "n_docs int, deltas binary, tfs binary, dls binary, pdeltas binary"
)

N_TERM_BUCKETS = 16

# Files per term_bucket directory (deterministic term-hash split):
# bounds query-time file listing at n_term_buckets × this, independent
# of build parallelism, while keeping enough files per bucket that
# head-term decode parallelizes (parquet row groups aren't splittable
# below file granularity at these sizes).
POSTINGS_FILES_PER_BUCKET = 8

# Staging directory-count cap.  Staging is checkpointed per BUCKET but
# laid out on disk per SHARD (a contiguous range of per_shard =
# ceil(n_buckets / MAX_STAGING_SHARDS) buckets): a 2^18-bucket build
# partitioned by bucket would create n_buckets × row_types ≈ 786k
# partition directories/files, and both the write commit and the
# read-side partition discovery are driver-side O(#dirs) — measured as
# a >60 min staging commit at 2^18 on this box vs ~1 min at 2^14.
# Sharding caps the directory count independently of bucket count
# (the same fix the postings layout applies via
# POSTINGS_FILES_PER_BUCKET); the bucket column stays physical in the
# files, rows are bucket-sorted so row-group min-max prunes within a
# shard, and resume granularity rounds up from bucket to shard (a
# shard is re-staged whole so dynamic partition overwrite replaces
# exactly the rows being recomputed).
MAX_STAGING_SHARDS = 4096

# Staging-task granularity knee, measured on the round-4 size curve
# (BASELINE.md: 973k/3.9M/9.7M turns).  A fixed bucket count makes
# per-task chunks grow linearly with the corpus — at 9.7M turns the
# old fixed 64 left ~152k-turn staging tasks and cost ~13% vs 160
# buckets (~61k turns/task, the size the 973k and 3.9M optima also
# sit at).  ``auto_bucket_count`` keeps tasks at this knee as the
# corpus grows, capped at MAX_AUTO_BUCKETS = 2^18 — the validated
# driver-bookkeeping bound (boundaries list + per-bucket stats are
# O(n_buckets) driver-side; 2^18 was exercised end-to-end incl.
# crash-resume, BASELINE.md rounds 3-4).  Past the cap (> ~15.7G
# turns) per-bucket size grows again, which is the design point's own
# shape: 10^12 / 2^18 ≈ 3.8M turns ≈ 1 GB text per bucket,
# "comfortably one task" on a real executor (SCALE.md §build).
TARGET_TURNS_PER_BUCKET = 60_000
MAX_AUTO_BUCKETS = 262_144

# Parquet row-group targets for the query-facing tables.  Both tables
# are written term-sorted so row-group min-max stats can serve
# point(ish) reads — but parquet's 128 MB default buffers a whole
# file into ONE group, which defeats the sort entirely (measured: a
# 3.9M-turn index's pc_bounds files were single ~1.7M-row groups, so
# every query decoded a full file to extract one term's rows).  The
# target is the writer's IN-MEMORY buffered size, and pc_bounds
# columns dictionary-encode to a few bytes/row in that accounting,
# so 2 MiB ≈ 0.5M-row groups here.  Measured at 3.9M turns
# (reference query set, min-of-5 alternating cold processes):
# sidecar read total 371 ms → 235 ms, and 2.2 s → 0.9 s inside a
# live session where decode competes with executor memory; storage
# +7%.  Tighter targets were tried and rejected: 256 KiB degrades
# into ~9.5k-row groups whose per-group overhead DOUBLES the table
# (73 → 153 MB) for no further read win.  postings groups stay
# larger: rows carry KB-scale block payloads and head-term scans
# want sequential-decode efficiency; the 8 MiB cap only matters once
# per-file size outgrows it (≥~20M turns at the fixed 128-file
# layout) — it guarantees a rare-term Spark scan never decompresses
# a whole multi-GB file for one term's row-group-pruned rows.
POSTINGS_ROW_GROUP_BYTES = 8 * 1024 * 1024
PC_BOUNDS_ROW_GROUP_BYTES = 2 * 1024 * 1024


def auto_bucket_count(n_rows: int, parallelism: int) -> int:
    """Doc-bucket count for a fresh build: one staging task per
    ~TARGET_TURNS_PER_BUCKET turns, floored at 4× the task-slot count
    so every slot sees work even on small corpora (4 waves bound the
    straggler tail without inflating per-task fixed costs), capped at
    the validated driver-bookkeeping bound."""
    by_size = -(-max(int(n_rows), 1) // TARGET_TURNS_PER_BUCKET)
    return min(max(4 * max(int(parallelism), 1), by_size),
               MAX_AUTO_BUCKETS)


def term_bucket(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    """Stable term → directory shard (same fn at build and query time)."""
    import zlib

    return (zlib.crc32(term.encode("utf-8")) & 0xFFFFFFFF) % n_buckets


def term_bucket_expr(n_buckets: int = N_TERM_BUCKETS):
    """JVM-side twin of ``term_bucket`` (CRC-32 IEEE mod n) — lets the
    postings job partition on the final directory layout without a
    python round-trip.  Equality with the python function is pinned by
    a unit test (tests/test_round3_fixes.py)."""
    from pyspark.sql import functions as F

    return F.expr(
        f"cast(pmod(crc32(encode(term, 'utf-8')), {n_buckets}) as int)")

DOCS_COLS = ["doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl",
             "text"]


def _single_parquet(index_dir: str, name: str) -> str:
    """Path for a driver-written single-file parquet table (readable by
    both ``spark.read.parquet`` and pandas); clears any directory left
    by an older layout."""
    import shutil

    path = os.path.join(index_dir, name)
    if os.path.isdir(path):
        shutil.rmtree(path)
    return path


def _bucket_udf(boundaries: list[str]):
    """Vectorized bucket(conv_id) = #{b in boundaries : b <= conv_id} − 1.

    boundaries[0] is "" so every non-null conv_id lands in a bucket.
    An Arrow-batched pandas UDF over ``np.searchsorted`` — O(log
    n_buckets) per row with the (tiny) boundary array closure-captured,
    so the plan carries no literal array and 2^18 buckets cost 18
    comparisons per row, not 262k.  Null conv_ids fail the build loudly
    (they have no place in the (conv_id, turn_idx) row invariant).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # Fixed-width unicode dtype: searchsorted compares via vectorized C
    # code-point comparison (~2× the object-dtype path at 2^18
    # boundaries).  Truncating a LONGER conv_id to the boundary width W
    # is safe: boundaries are untruncated (length ≤ W), so any
    # comparison is decided within W characters, and a conv_id whose
    # W-prefix equals a boundary is ≥ it under both full and truncated
    # comparison ('\\0' padding sorts below every real character,
    # matching python's shorter-string-first semantics).
    width = max(1, max(len(b) for b in boundaries))
    bounds = np.array(boundaries, dtype=f"U{width}")

    @pandas_udf("int")
    def assign(conv: pd.Series) -> pd.Series:
        if conv.isna().any():
            raise ValueError(
                "null conv_id in transcripts input — every row needs a "
                "(conv_id, turn_idx) key; filter nulls upstream")
        vals = conv.to_numpy().astype(bounds.dtype)
        idx = np.searchsorted(bounds, vals, side="right") - 1
        return pd.Series(idx, dtype="int32")

    return assign


def compute_boundaries(spark, df, n_buckets: int,
                       samples_per_batch: int = 64) -> list[str]:
    """Range-bucket boundaries from a single bounded sampling pass.

    The RangePartitioner idea without its extra jobs: every Arrow batch
    of every input partition contributes ≤ ``samples_per_batch``
    evenly-spaced conv_ids (deterministic — no RNG), the driver sorts
    the bounded sample and takes turn-weighted quantiles.  One Spark
    job, O(partitions · samples_per_batch) driver memory; sampling rows
    (not distinct conv_ids) weights boundaries by turns per
    conversation, which balances bucket *row counts*, not just
    conversation counts.  Boundaries are persisted in the build config
    so resumes reuse them.
    """
    import numpy as np

    if n_buckets <= 1:
        return [""]

    def sampler(pdf_iter):
        for pdf in pdf_iter:
            pdf = pdf.dropna(subset=["conv_id"])
            if len(pdf) == 0:
                continue
            idx = np.linspace(0, len(pdf) - 1,
                              min(samples_per_batch, len(pdf))).astype(int)
            yield pdf.iloc[idx][["conv_id"]]

    sample = sorted(
        r["conv_id"]
        for r in df.select("conv_id").mapInPandas(
            sampler, "conv_id string").collect())
    if not sample:
        return [""]
    qs = np.linspace(0, len(sample) - 1, n_buckets + 1).astype(int)[1:-1]
    bounds = sorted({sample[i] for i in qs})
    return [""] + [b for b in bounds if b > ""]


_STAGING_COLS = ["bucket", "doc_id", "row_type", "conv_id", "turn_idx",
                 "role", "tool", "ts", "text", "dl", "term", "n_docs",
                 "first_doc_id", "last_doc_id", "deltas", "tfs", "dls"]


def _staging_pad(pdf: pd.DataFrame,
                 positions: bool = False) -> pd.DataFrame:
    """Fill the staging columns a row type doesn't carry with typed
    nulls and order columns to ``_STAGING_COLS`` (+ ``pdeltas`` when
    the build stages positions — the default layout is unchanged so
    positions-less builds stay byte-identical across versions)."""
    n = len(pdf)
    defaults = {
        "bucket": 0, "doc_id": pd.array([None] * n, dtype="Int64"),
        "row_type": "", "conv_id": None,
        "turn_idx": pd.array([None] * n, dtype="Int32"),
        "role": None, "tool": None, "ts": pd.NaT, "text": None,
        "dl": pd.array([None] * n, dtype="Int32"), "term": None,
        "n_docs": pd.array([None] * n, dtype="Int32"),
        "first_doc_id": pd.array([None] * n, dtype="Int64"),
        "last_doc_id": pd.array([None] * n, dtype="Int64"),
        "deltas": None, "tfs": None, "dls": None,
    }
    cols = _STAGING_COLS
    if positions:
        defaults["pdeltas"] = None
        cols = _STAGING_COLS + ["pdeltas"]
    for c, v in defaults.items():
        if c not in pdf.columns:
            pdf[c] = v
    return pdf[cols]


def _staging_iter(mode: str, offsets, chunk_size: int,
                  positions: bool = False):
    """mapInPandas body for the per-bucket staging pass.

    Input is hash-partitioned by shard and sorted within partitions by
    (bucket, conv_id, turn_idx); per-bucket doc counters carry across
    Arrow batches.  doc_ids are FINAL global ids — ``offsets`` (from
    the exact-count pre-pass, pinned in the build config) plus the
    per-bucket running index.

    Emits one 'doc' row per turn (with dl) and one pre-encoded 'run'
    row per (term, chunk, bucket): that term's postings within the
    chunk, varbyte-encoded with the posting-block codec.  Runs never
    span a bucket (staged bytes stay parallelism-invariant — bucket
    content is the only input) or a chunk (so the downstream re-encode
    groups are exactly the canonical (term, chunk) block groups).
    Token rows therefore cross the Arrow boundary once, here; the
    shuffle downstream moves only compressed runs.

    With ``positions=True`` each run row also carries ``pdeltas`` —
    per-doc within-doc position deltas (varbyte, concatenated in doc
    order; per-doc counts are the ``tfs`` values) — computed in the
    SAME tokenize pass, so positional indexing adds no extra scan and
    no extra shuffle rows, only bytes on the existing run rows.
    """

    def fn(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from itertools import chain

        import numpy as np

        from .postings import vb_encode_many

        offs = np.asarray(offsets, dtype=np.int64)
        counters: dict[int, int] = {}
        post_counts: dict[int, int] = {}
        dl_sums: dict[int, int] = {}
        stemmer = make_stemmer(mode)

        # open (bucket, chunk) accumulation — flushed when either
        # changes or the partition ends; bounded by chunk_size docs
        open_bucket = -1
        open_chunk = -1
        acc_terms: list = []   # python-str lists, one per appended slice
        acc_docs: list = []    # int64 arrays (global doc_ids, repeated)
        acc_tfs: list = []
        acc_dls: list = []
        acc_pblobs: list = []  # per-(doc, term)-row position blobs

        def flush() -> pd.DataFrame | None:
            nonlocal acc_terms, acc_docs, acc_tfs, acc_dls, acc_pblobs
            if not acc_docs:
                return None
            terms_f = np.array(list(chain.from_iterable(acc_terms)),
                               dtype=object)
            doc_f = np.concatenate(acc_docs)
            tf_f = np.concatenate(acc_tfs)
            dl_f = np.concatenate(acc_dls)
            pb_f = (np.concatenate(acc_pblobs)
                    if positions and acc_pblobs else None)
            acc_terms, acc_docs, acc_tfs, acc_dls, acc_pblobs = \
                [], [], [], [], []
            if doc_f.shape[0] == 0:
                # every doc in the segment tokenized to zero terms (the
                # accumulator LIST was non-empty but each appended slice
                # was) — no run rows; the docs (dl=0) were already
                # emitted.  Tiny buckets hit this for real: at 2^18
                # buckets over 3.9M turns a (bucket, chunk) segment is
                # ~15 docs, and an all-empty segment crashed the
                # change[0] grouping below (found by the round-4 2^18
                # validation; impossible to hit at 64 buckets where
                # segments are ~60k docs).
                return None
            # group the chunk's postings by term: factorize (C-speed
            # hash) + stable argsort on the codes keeps each term's
            # postings in ascending doc order
            codes, uniques = pd.factorize(terms_f)
            order = np.argsort(codes, kind="stable")
            c = codes[order]
            d = doc_f[order]
            t = tf_f[order]
            dl_s = dl_f[order]
            n = c.shape[0]
            change = np.empty(n, dtype=bool)
            change[0] = True
            np.not_equal(c[1:], c[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            cnts = np.diff(np.append(starts, n))
            gaps = np.empty(n, dtype=np.int64)
            gaps[0] = 0
            np.subtract(d[1:], d[:-1], out=gaps[1:])
            gaps[starts] = 0
            cols = {
                "bucket": np.int32(open_bucket),
                "row_type": "run",
                "term": np.asarray(uniques, dtype=object)[c[starts]],
                "n_docs": pd.array(cnts, dtype="Int32"),
                "first_doc_id": pd.array(d[starts], dtype="Int64"),
                "last_doc_id": pd.array(d[starts + cnts - 1],
                                        dtype="Int64"),
                "deltas": vb_encode_many(gaps, cnts),
                "tfs": vb_encode_many(t, cnts),
                "dls": vb_encode_many(dl_s, cnts),
            }
            if positions:
                # per-row blobs, reordered with the postings rows, then
                # concatenated per run (docs ascend within a run, so
                # the blob stream is in doc order by construction)
                pb = pb_f[order]
                cols["pdeltas"] = [
                    b"".join(pb[s:s + cn])
                    for s, cn in zip(starts, cnts)]
            runs = pd.DataFrame(cols)
            return _staging_pad(runs, positions)

        for pdf in pdf_iter:
            n = len(pdf)
            if n == 0:
                continue
            buckets = pdf["bucket"].values.astype(np.int64)
            texts = pdf["text"].values
            if positions:
                counts_list = [
                    doc_term_positions(t if isinstance(t, str) else None,
                                       mode=mode, _stemmer=stemmer)
                    for t in texts
                ]
                n_terms = np.fromiter((len(c) for c in counts_list),
                                      np.int64, count=n)
                dl_arr = np.fromiter(
                    (sum(len(v) for v in c.values())
                     for c in counts_list), np.int64, count=n)
                # one blob per (doc, term) row: within-doc position
                # deltas (first absolute), varbyte — all rows of the
                # batch encoded in one vectorized pass
                row_counts = np.fromiter(
                    (len(v) for c in counts_list for v in c.values()),
                    np.int64, count=int(n_terms.sum()))
                total_pos = int(row_counts.sum())
                flat = np.fromiter(
                    (p for c in counts_list for v in c.values()
                     for p in v), np.int64, count=total_pos)
                pdelta = np.empty_like(flat)
                if total_pos:
                    pdelta[1:] = flat[1:] - flat[:-1]
                    row_starts = np.concatenate(
                        ([0], np.cumsum(row_counts)[:-1]))
                    pdelta[row_starts] = flat[row_starts]
                blobs_batch = np.array(
                    vb_encode_many(pdelta, row_counts), dtype=object)
                row_offs = np.concatenate(([0], np.cumsum(n_terms)))
            else:
                counts_list = [
                    doc_terms_tf(t if isinstance(t, str) else None,
                                 mode=mode, _stemmer=stemmer)
                    for t in texts
                ]
                n_terms = np.fromiter((len(c) for c in counts_list),
                                      np.int64, count=n)
                dl_arr = np.fromiter((sum(c.values()) for c in counts_list),
                                     np.int64, count=n)
            # per-bucket doc numbering: input is sorted by bucket, so
            # buckets form contiguous segments; counters persist across
            # Arrow batches (a bucket may span batches, never tasks)
            doc_id = np.empty(n, np.int64)
            bchange = np.empty(n, dtype=bool)
            bchange[0] = True
            np.not_equal(buckets[1:], buckets[:-1], out=bchange[1:])
            bstarts = np.flatnonzero(bchange)
            for s, e in zip(bstarts, np.append(bstarts[1:], n)):
                bkt = int(buckets[s])
                base = counters.get(bkt, 0)
                doc_id[s:e] = offs[bkt] + np.arange(base, base + (e - s))
                counters[bkt] = int(base + (e - s))
                dl_sums[bkt] = dl_sums.get(bkt, 0) + int(dl_arr[s:e].sum())
                post_counts[bkt] = post_counts.get(bkt, 0) \
                    + int(n_terms[s:e].sum())
            chunk_arr = doc_id // chunk_size
            # accumulate postings per (bucket, chunk) segment
            kchange = bchange.copy()
            np.logical_or(kchange[1:], chunk_arr[1:] != chunk_arr[:-1],
                          out=kchange[1:])
            seg_starts = np.flatnonzero(kchange)
            seg_ends = np.append(seg_starts[1:], n)
            for s, e in zip(seg_starts, seg_ends):
                bkt, ch = int(buckets[s]), int(chunk_arr[s])
                if bkt != open_bucket or ch != open_chunk:
                    out = flush()
                    if out is not None:
                        yield out
                    open_bucket, open_chunk = bkt, ch
                seg_counts = counts_list[s:e]
                seg_n = n_terms[s:e]
                acc_terms.append(list(chain.from_iterable(seg_counts)))
                acc_docs.append(np.repeat(doc_id[s:e], seg_n))
                if positions:
                    acc_tfs.append(np.fromiter(
                        (len(v) for c in seg_counts
                         for v in c.values()),
                        np.int64, count=int(seg_n.sum())))
                    acc_pblobs.append(
                        blobs_batch[row_offs[s]:row_offs[e]])
                else:
                    acc_tfs.append(np.fromiter(
                        chain.from_iterable(
                            c.values() for c in seg_counts),
                        np.int64, count=int(seg_n.sum())))
                acc_dls.append(np.repeat(dl_arr[s:e], seg_n))
            docs = pd.DataFrame({
                "bucket": buckets, "doc_id": doc_id,
                "row_type": "doc",
                "conv_id": pdf["conv_id"].values,
                "turn_idx": pdf["turn_idx"].values,
                "role": pdf["role"].values, "tool": pdf["tool"].values,
                "ts": pdf["ts"].values, "text": texts,
                "dl": pd.array(dl_arr, dtype="Int32"),
            })
            yield _staging_pad(docs, positions)
        out = flush()
        if out is not None:
            yield out
        # One 'bstat' summary row per bucket this task owned: exact doc
        # / posting / dl totals, so the build never re-scans staging to
        # count (the totals ride out through the same committed write),
        # and the driver verifies them against the pre-pass counts (a
        # loud failure if the input changed between the two passes).
        if counters:
            import json as _json

            stat = pd.DataFrame({
                "bucket": list(counters.keys()),
                "row_type": "bstat",
                "text": [_json.dumps(
                    {"docs": counters[b], "tf_rows": post_counts.get(b, 0),
                     "dl_sum": dl_sums[b]}) for b in counters],
            })
            yield _staging_pad(stat, positions)

    return fn


def _reencode_iter(avgdl: float, k1: float, b: float, block_size: int,
                   n_term_buckets: int = N_TERM_BUCKETS):
    """mapInPandas body turning staged posting RUNS into canonical
    chunk-local blocks.

    Input: run rows sorted within partitions by (term, chunk,
    first_doc_id); every run of a (term, chunk) group is in the same
    partition because the shuffle key IS the (term, chunk) group key.  Each batch is decoded in ONE vectorized pass
    (``decode_blocks_batch``) and the (term, chunk) groups — each the
    concatenation of disjoint ascending bucket runs — are re-encoded
    in ONE vectorized pass (``encode_blocks_batch``), yielding blocks
    byte-identical to encoding each group's postings in one shot: the
    final index is invariant to bucketing AND build parallelism.  The
    last (term, chunk) group of
    each Arrow batch may continue in the next batch, so its runs are
    carried over (carry ≤ chunk_size postings, compressed).
    """
    import numpy as np

    from .postings import decode_blocks_batch, encode_blocks_batch

    def encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        # Sorted input → group boundaries via numpy change points, then
        # ONE vectorized decode and ONE vectorized block encode for the
        # whole batch (a pandas groupby — or per-group numpy work —
        # over ~10^6 tiny (term, chunk) groups pays ~100 µs of
        # dispatch per group; this pays ~1 µs).
        terms = pdf["term"].values
        chunks = pdf["chunk"].values.astype(np.int64)
        counts = pdf["n_docs"].values.astype(np.int64)
        doc_ids, tfs_a, dls_a = decode_blocks_batch(
            pdf["first_doc_id"].values.astype(np.int64), counts,
            list(pdf["deltas"].values), list(pdf["tfs"].values),
            list(pdf["dls"].values))
        n = terms.shape[0]
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(terms[1:], terms[:-1], out=change[1:])
        np.logical_or(change[1:], chunks[1:] != chunks[:-1],
                      out=change[1:])
        run_starts = np.flatnonzero(change)
        post_cum = np.concatenate([np.zeros(1, dtype=np.int64),
                                   np.cumsum(counts)])
        group_counts = np.diff(np.append(post_cum[run_starts],
                                         post_cum[-1]))
        (block_group, first_ids, last_ids, n_docs_b, deltas_b, tfs_b,
         dls_b, mx) = encode_blocks_batch(
            doc_ids, tfs_a, dls_a, group_counts, avgdl,
            block_size=block_size, k1=k1, b=b)
        group_terms = terms[run_starts]
        block_terms = group_terms[block_group]
        # term_bucket per unique group term (python crc32, one probe
        # per distinct term rather than per block)
        bucket_cache: dict[str, int] = {}
        tb_per_group = np.fromiter(
            (bucket_cache.setdefault(t, term_bucket(t, n_term_buckets))
             for t in group_terms), np.int32, count=group_terms.shape[0])
        return pd.DataFrame({
            "term": block_terms,
            "term_bucket": tb_per_group[block_group],
            "first_doc_id": first_ids,
            "last_doc_id": last_ids,
            "n_docs": n_docs_b.astype(np.int32),
            "deltas": deltas_b,
            "tfs": tfs_b,
            "dls": dls_b,
            "max_tfnorm": mx,
        })

    def fn(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in pdf_iter:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_term = pdf["term"].iat[-1]
            last_chunk = pdf["chunk"].iat[-1]
            tail = (pdf["term"] == last_term) & (pdf["chunk"] == last_chunk)
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield encode_groups(body)
        if carry is not None and len(carry):
            yield encode_groups(carry)

    return fn


def build_index(spark, transcripts, index_dir: str, *, mode: str = "english",
                n_buckets: int | str = 32,
                buckets_per_job: int | None = None,
                resume: bool = False, k1: float = K1, b: float = B,
                block_size: int = BLOCK_SIZE, chunk_size: int = CHUNK_SIZE,
                shuffle_partitions: int | None = None,
                n_term_buckets: int = N_TERM_BUCKETS,
                doc_id_offset: int = 0,
                positions: bool = False,
                allow_empty: bool = False,
                fail_after_groups: int | None = None) -> dict:
    """Build (or resume) the full index at ``index_dir``.

    ``n_buckets="auto"`` sizes the doc-bucket count from the corpus
    (one extra count() over the conv_id-pruned scan) via
    ``auto_bucket_count`` — fixed counts leave per-task chunks growing
    linearly with the corpus.  Resumed builds always reuse the count
    persisted in the build config.

    ``fail_after_groups`` aborts after N staging bucket-groups — used
    by resume tests to simulate a mid-build crash (the analogue of
    killing a TimelineScanJob between checkpoints).

    ``positions=True`` additionally writes the ``positions`` table —
    per-(term, chunk, bucket) runs carrying per-doc within-doc token
    positions (see POSITIONS_SCHEMA_DDL) — enabling exact
    ``FTSIndex.search_phrase``.  Positions are computed in the same
    staging tokenize pass and add no extra scan or shuffle rows; a
    positions-less build stays byte-identical to previous versions.
    The flag is pinned in the build config: resumes, delta segments
    and compact() all inherit it.

    ``allow_empty`` permits a corpus whose documents ALL tokenize to
    zero terms: docs/stats still get written (the docs stay
    point-gettable, dl=0) and there is nothing to encode and no term
    any query could match.  Delta-segment builds
    (incremental.apply_updates) set this — a batch that blanks a few
    documents' text to whitespace/stopwords-only is legitimate, and
    the segment's files are adopted into a base index that has its
    own postings (the segment writes no postings at all).  compact()
    sets it too: a standalone rebuild (doc_id_offset == 0) writes
    schema-only flat empty postings/pc_bounds so the resulting index
    still opens.  A fresh standalone build WITHOUT the flag keeps the
    loud failure — silently committing a term-less base index that
    "looks built" but answers nothing is an upstream data bug.
    """
    from pyspark.sql import functions as F

    t_start = time.time()
    run_id = uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # AQE pays off on the build's wide shuffles (runtime coalescing);
    # FTSIndex turns it off for the latency-sensitive query path, so
    # re-enable here in case this session served queries before.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    if shuffle_partitions is None:
        shuffle_partitions = spark.sparkContext.defaultParallelism

    config = mf.load_config(index_dir) if resume else None
    if config is None:
        # A fresh (non-resume) build into a dir that already holds an
        # index starts CLEAN: the previous build's manifest would
        # otherwise mark stages 'done' against the new config's empty
        # bucket stats (committing an empty corpus), and stale
        # tombstones / delta segments / differently-sharded postings
        # dirs would survive the per-stage dynamic overwrites.  The
        # wipe is gated on the dir actually being an index (it has a
        # build config) — arbitrary paths are never deleted.
        if mf.load_config(index_dir) is not None:
            import shutil

            shutil.rmtree(index_dir)
        if n_buckets == "auto":
            n_buckets = auto_bucket_count(
                transcripts.count(),
                spark.sparkContext.defaultParallelism)
        boundaries = compute_boundaries(spark, transcripts, n_buckets)
        # Exact per-bucket doc counts (reads the conv_id column ONLY —
        # parquet column pruning never touches the text payloads): pins
        # the global doc_id offsets in the config BEFORE staging, so
        # staged rows carry final doc_ids and postings can be
        # pre-encoded map-side.  Driver memory is O(n_buckets), the
        # same scale the boundaries list already is.
        cnt_rows = (transcripts
                    .select(_bucket_udf(boundaries)(F.col("conv_id"))
                            .alias("bucket"))
                    .groupBy("bucket").count().collect())
        counts = [0] * len(boundaries)
        for r in cnt_rows:
            counts[int(r["bucket"])] = int(r["count"])
        config = {"mode": mode, "n_buckets": len(boundaries), "k1": k1,
                  "b": b, "block_size": block_size, "chunk_size": chunk_size,
                  "n_term_buckets": n_term_buckets,
                  "doc_id_offset": doc_id_offset,
                  "positions": bool(positions),
                  "pc_granularity": max(64, chunk_size // 32),
                  "boundaries": boundaries, "bucket_counts": counts,
                  "bucket_stats": {}}
        mf.save_config(index_dir, config)
    boundaries = config["boundaries"]
    n_buckets = config["n_buckets"]
    mode, k1, b = config["mode"], config["k1"], config["b"]
    positions = bool(config.get("positions", False))
    block_size, chunk_size = config["block_size"], config["chunk_size"]
    n_term_buckets = config.get("n_term_buckets", N_TERM_BUCKETS)
    doc_id_offset = int(config.get("doc_id_offset", 0))
    if "bucket_counts" not in config:
        raise ValueError(
            "this index was staged by a pre-run-format build (no "
            "bucket_counts in _build_config.json) — resume is not "
            "possible across the staging format change; rebuild fresh")
    counts = [int(c) for c in config["bucket_counts"]]
    offsets = [0] * n_buckets
    acc = doc_id_offset
    for bkt in range(n_buckets):
        offsets[bkt] = acc
        acc += counts[bkt]

    staging_path = os.path.join(index_dir, "staging")
    bucket_col = _bucket_udf(boundaries)(F.col("conv_id"))

    # ---- stage 1: per-bucket staging (docs numbering + tokenize/tf) ----
    # Disk layout is per SHARD (see MAX_STAGING_SHARDS); checkpoint
    # marks stay per bucket, but the pending set and job groups round
    # up to whole shards so a dynamic partition overwrite of a shard
    # directory always rewrites every bucket stored in it.
    per_shard = -(-n_buckets // min(n_buckets, MAX_STAGING_SHARDS))
    done = mf.done_partitions(index_dir, "staging")
    pending = [bkt for bkt in range(n_buckets) if bkt not in done]
    if per_shard > 1 and pending:
        shards = sorted({bkt // per_shard for bkt in pending})
        pending = [bkt for s in shards
                   for bkt in range(s * per_shard,
                                    min((s + 1) * per_shard, n_buckets))]
    group_size = buckets_per_job or max(1, len(pending))
    group_size = max(per_shard, -(-group_size // per_shard) * per_shard)
    groups = [pending[i:i + group_size]
              for i in range(0, len(pending), group_size)]
    for gi, group in enumerate(groups):
        if fail_after_groups is not None and gi >= fail_after_groups:
            raise RuntimeError(
                f"simulated crash after {fail_after_groups} staging groups")
        t0 = time.time()
        mf.mark(index_dir, "staging", group, "running")
        # Hash partitioning never splits a bucket across tasks, so the
        # staging task count is capped: with heavy over-bucketing
        # (resume granularity finer than the executor count wants)
        # several buckets share one task instead of paying per-task
        # scheduling for 238-doc partitions.  On a real cluster the cap
        # is executor-count-scaled via defaultParallelism.
        group_shards = sorted({bkt // per_shard for bkt in group})
        n_parts = min(max(len(group_shards), 1),
                      max(64, shuffle_partitions * 8))
        shard_col = F.expr(f"cast(bucket div {per_shard} as int)")
        sub = transcripts.withColumn("bucket", bucket_col) \
            .withColumn("shard", shard_col)
        if len(group) < n_buckets:
            # resume case only — a fresh full build stages every bucket
            # and skips the IN-list (16k literals would bloat the plan)
            sub = sub.filter(
                F.col("shard").isin([int(s) for s in group_shards]))
        # partition on shard (shard ⊇ bucket, so a bucket still never
        # splits across tasks) → each shard directory is written by
        # exactly one task: total staging files = n_shards × row_types
        # regardless of bucket count or build parallelism
        sub = (sub.repartition(n_parts, "shard")
               .sortWithinPartitions("bucket", "conv_id", "turn_idx"))
        staging_ddl = STAGING_SCHEMA_DDL + (
            ", pdeltas binary" if positions else "")
        staged = sub.mapInPandas(
            _staging_iter(mode, offsets, chunk_size, positions),
            staging_ddl).withColumn("shard", shard_col)
        # Partitioned by (shard, row_type): later stages read doc / tf
        # rows via directory pruning on row_type, per-bucket reads
        # prune shard dirs then push the bucket predicate into the
        # bucket-sorted row groups, and the per-bucket 'bstat' summary
        # rows (exact doc/tf/dl totals, emitted by the staging tasks
        # themselves) come back without scanning any data.  A fresh
        # full build commits in static mode (one whole-directory
        # commit); per-partition dynamic overwrite is only needed when
        # re-staging a subset of shards on resume.
        fresh_full = len(groups) == 1 and not done
        writer = staged.write.mode("overwrite") \
            .partitionBy("shard", "row_type")
        if fresh_full:
            writer = writer.option("partitionOverwriteMode", "static")
        writer.parquet(staging_path)
        t_write_done = time.time()
        import json as _json

        bstat_df = (spark.read.parquet(staging_path)
                    .filter(F.col("row_type") == "bstat"))
        if len(group) < n_buckets:
            # shard dirs pruned first, then the bucket IN-list (small:
            # a resumed group, never the full 2^18) on the data column
            bstat_df = bstat_df.filter(
                F.col("shard").isin([int(s) for s in group_shards])
            ).filter(F.col("bucket").isin([int(x) for x in group]))
        stat_rows = bstat_df.select("bucket", "text").collect()
        t_bstat_done = time.time()
        rows_in = {int(x): 0 for x in group}
        terms_out = {int(x): 0 for x in group}
        dl_sums = {int(x): 0 for x in group}
        for r in stat_rows:
            bkt = int(r["bucket"])
            s = _json.loads(r["text"])
            rows_in[bkt] = int(s["docs"])
            terms_out[bkt] = int(s["tf_rows"])
            dl_sums[bkt] = int(s["dl_sum"])
        for bkt in group:
            if rows_in[int(bkt)] != counts[int(bkt)]:
                raise RuntimeError(
                    f"bucket {bkt}: staged {rows_in[int(bkt)]} docs but "
                    f"the count pre-pass saw {counts[int(bkt)]} — the "
                    "transcripts input changed mid-build; rebuild fresh")
            config["bucket_stats"][str(int(bkt))] = {
                "docs": rows_in[int(bkt)], "tf_rows": terms_out[int(bkt)],
                "dl_sum": dl_sums[int(bkt)]}
        mf.save_config(index_dir, config)
        mf.mark(index_dir, "staging", group, "done", rows_in=rows_in,
                terms_out=terms_out)
        mf.record_metrics(
            index_dir, run_id, "staging",
            [(int(bkt), "seconds", time.time() - t0) for bkt in group]
            + [(int(bkt), "docs", rows_in.get(bkt, 0)) for bkt in group]
            + [(int(bkt), "tf_rows", terms_out.get(bkt, 0)) for bkt in group]
            # substage walls (group-level; partition_id -1): where the
            # stage spends its time — the parallel write job vs the
            # driver-serial bstat collect vs manifest/config I/O
            + [(-1, "write_sec", t_write_done - t0),
               (-1, "bstat_sec", t_bstat_done - t_write_done),
               (-1, "manifest_sec", time.time() - t_bstat_done)])

    total_tf = sum(int(s["tf_rows"])
                   for s in config["bucket_stats"].values())
    if total_tf == 0 and not allow_empty:
        # every document in the corpus tokenized to zero terms — a
        # term-less index has no postings schema to write and nothing
        # a query could ever match; for a FRESH build this is an
        # upstream data bug, so fail loudly instead of committing an
        # index that looks built but answers nothing (regression-
        # tested; the real-world variant — zero-term SEGMENTS inside
        # a healthy corpus — is handled in the staging flush above).
        # Delta-segment builds pass allow_empty: tombstones for the
        # replaced revisions are already adopted by the time the
        # segment builds, so raising here would strand the batch
        # mid-apply with the old docs invisible and every retry
        # failing the same way (found by review, round 4).
        raise ValueError(
            "corpus produced zero indexable terms (all documents "
            "tokenized empty under mode=%r) — refusing to build a "
            "term-less index" % mode)

    staging = spark.read.parquet(staging_path)
    doc_rows = staging.filter(F.col("row_type") == "doc")
    run_rows = staging.filter(F.col("row_type") == "run")

    # ---- stage 2: global stats ----
    # N / avgdl / doc_id offsets come free from the per-bucket staging
    # counts persisted in the build config — no extra scan of staging.
    # Only term df needs its own (partial+final hash agg) job.
    bstats = config["bucket_stats"]
    n_docs = sum(bstats[str(b_)]["docs"] for b_ in range(n_buckets)
                 if str(b_) in bstats)
    total_dl = sum(bstats[str(b_)]["dl_sum"] for b_ in range(n_buckets)
                   if str(b_) in bstats)
    avgdl = (total_dl / n_docs) if n_docs else 0.0

    # ---- stages 2-4: stats / docs / postings ----
    # The three output jobs depend only on staging, not on each other,
    # so they are submitted CONCURRENTLY (ThreadPoolExecutor → separate
    # Spark jobs sharing the executor pool).  On a big cluster this
    # keeps slots busy across the jobs' scheduling/commit gaps; same
    # effect in local mode.  Manifest marks happen in the main thread
    # (the manifest file is a read-modify-write).
    def _job_stats():
        pd.DataFrame([{"n_docs": n_docs, "avgdl": avgdl,
                       "total_dl": total_dl}]).to_parquet(
            _single_parquet(index_dir, "corpus_stats"), index=False)
        # df per term = Σ run n_docs (each posting is one (doc, term)
        # pair) — an agg over run METADATA columns, never token rows
        (run_rows.groupBy("term")
         .agg(F.sum("n_docs").cast("long").alias("df"))
         .sortWithinPartitions("term")
         .write.mode("overwrite")
         .parquet(os.path.join(index_dir, "term_stats")))

    def _job_docs():
        # Map-only write, zero joins: staging rows carry FINAL doc_ids
        # (offsets pinned by the count pre-pass) and are shard-
        # partitioned and sorted by (bucket, conv_id, turn_idx), so
        # doc_id is already monotone within every output file —
        # file-level min-max on doc_id stays disjoint with zero shuffle.
        (doc_rows
         .select("doc_id", "conv_id", "turn_idx", "role", "tool",
                 "ts", "dl", "text")
         .write.mode("overwrite").parquet(os.path.join(index_dir, "docs")))

    def _job_postings():
        # Two exchanges, both moving compressed data (~the index size,
        # never the ~10× larger raw token rows):
        #
        # 1. The EXPENSIVE re-encode shuffle is keyed on (term, chunk)
        #    sized by shuffle_partitions — chunk varies within a term,
        #    so a stopword-like head term (30% of a 10^12-doc corpus)
        #    spreads its bounded (term, chunk) groups across ALL tasks
        #    instead of melting one reducer, and decode+re-encode
        #    parallelism scales with the cluster rather than being
        #    capped at n_term_buckets × POSTINGS_FILES_PER_BUCKET.
        #    Every run of a (term, chunk) group still lands whole in
        #    one partition (the key is the group key).
        # 2. A CHEAP exchange of the already-encoded blocks onto the
        #    final physical layout (term_bucket, term-hash file split)
        #    before the write, keeping the layout deterministic at any
        #    parallelism: n_term_buckets dirs, ≤
        #    POSTINGS_FILES_PER_BUCKET files each — enough files that
        #    head-term decode parallelizes at query time, few enough
        #    that listing is O(buckets).
        runs = run_rows.select("term", "first_doc_id", "last_doc_id",
                               "n_docs", "deltas", "tfs", "dls")
        encoded = (
            runs.withColumn("chunk", (F.col("first_doc_id") / chunk_size)
                            .cast("long"))
            .repartition(shuffle_partitions, "term", "chunk")
            .sortWithinPartitions("term", "chunk", "first_doc_id")
            .mapInPandas(
                _reencode_iter(avgdl, k1, b, block_size, n_term_buckets),
                POSTINGS_SCHEMA_DDL)
        )
        # rows term-sorted inside each file so row-group min-max
        # pruning works at query time; the in-partition sort after the
        # layout exchange also re-establishes deterministic row order
        # ((term, first_doc_id) is unique per block), so the written
        # bytes stay invariant to build parallelism
        split = F.abs(F.hash("term")) % POSTINGS_FILES_PER_BUCKET
        (encoded
         .withColumn("_split", split)
         .repartition(n_term_buckets * POSTINGS_FILES_PER_BUCKET,
                      "term_bucket", "_split")
         .drop("_split")
         .sortWithinPartitions("term", "first_doc_id")
         .write.mode("overwrite").partitionBy("term_bucket")
         # parquet's default 128 MB row-group target leaves ONE group
         # per file here, so the term-sorted layout prunes nothing
         # inside a file: a one-term query decompresses every block
         # payload in the touched files.  Capped groups make the sort
         # pay — min-max stats narrow a rare-term read to the groups
         # actually holding the term (a no-op below ~20M turns where
         # files are already smaller than the cap).
         .option("parquet.block.size", str(POSTINGS_ROW_GROUP_BYTES))
         .parquet(os.path.join(index_dir, "postings")))

    # ---- stage 5: pseudo-chunk bound sidecar ----
    # Per (term, pc) max block bound at the PRUNING granularity G —
    # the metadata the pruned query path needs to pick seed chunks and
    # prune, precomputed ONCE here so queries read it with a pyarrow
    # predicate scan instead of re-deriving it from the postings
    # metadata (explode + two groupBys) on EVERY query (VERDICT r2
    # item 5).  Reads the *written* postings table (metadata columns
    # only — parquet column pruning never touches the block payloads)
    # rather than the encode lineage, which would re-run the python
    # encoder.  Layout mirrors postings: term_bucket dirs for partition
    # pruning, term-sorted rows for row-group min-max pruning.
    def _build_pc_bounds():
        t0 = time.time()
        G = int(config.get("pc_granularity", max(64, chunk_size // 32)))
        meta = spark.read.parquet(os.path.join(index_dir, "postings")) \
            .select("term_bucket", "term", "first_doc_id",
                    "last_doc_id", "max_tfnorm")
        # ONE exchange of the COMPACT block-meta rows (≈ #blocks, vs
        # ~33× more exploded (term, pc) pairs), keyed directly on the
        # final physical layout: (term_bucket, term-hash split) lands
        # EVERY block of a term in one partition, so the vectorized
        # per-partition explode + max below is complete with no
        # aggregation shuffle and the in-pandas (term, pc) sort feeds
        # the row-group layout.  The previous plan (JVM
        # sequence-explode → groupBy → repartition(n_term_buckets))
        # shuffled the exploded pairs TWICE and funneled the final
        # sort through n_term_buckets tasks, each sorting
        # pc_rows/n_term_buckets — measured superlinear on the size
        # curve (9.7M → 19.4M turns: 2.0× rows, 3.7× wall,
        # BASELINE.md round 4); this shape moves ~30× fewer rows and
        # its write parallelism matches the postings table's.
        split = F.abs(F.hash("term")) % POSTINGS_FILES_PER_BUCKET

        def _explode_agg(it):
            import numpy as np
            import pandas as pd
            parts = [pdf for pdf in it if len(pdf)]
            if not parts:
                return
            pdf = (pd.concat(parts, ignore_index=True)
                   if len(parts) > 1 else parts[0])
            lo = pdf["first_doc_id"].to_numpy(np.int64) // G
            hi = pdf["last_doc_id"].to_numpy(np.int64) // G
            n = hi - lo + 1
            idx = np.repeat(np.arange(len(pdf), dtype=np.int64), n)
            start = np.cumsum(n) - n
            pc = lo[idx] + (np.arange(idx.size, dtype=np.int64)
                            - start[idx])
            out = pd.DataFrame(
                {"term_bucket": pdf["term_bucket"].to_numpy()[idx],
                 "term": pdf["term"].to_numpy()[idx],
                 "pc": pc,
                 "mtf": pdf["max_tfnorm"].to_numpy(np.float64)[idx]})
            # (term, pc) is unique per partition after the max, so the
            # sorted output rows are deterministic regardless of
            # shuffle fetch order — build parallelism never changes
            # the written bytes (same invariant as the postings table)
            yield (out.groupby(["term_bucket", "term", "pc"],
                               sort=False)["mtf"].max().reset_index()
                   .sort_values(["term", "pc"], kind="stable"))

        pcb = (meta.withColumn("_split", split)
               .repartition(n_term_buckets * POSTINGS_FILES_PER_BUCKET,
                            "term_bucket", "_split")
               .drop("_split")
               .mapInPandas(
                   _explode_agg,
                   "term_bucket int, term string, pc long, mtf double"))
        (pcb.write.mode("overwrite").partitionBy("term_bucket")
            # point-read layout: the query path reads a few terms'
            # rows per query via a pyarrow predicate scan, so capped
            # term-sorted row groups turn that into a row-group-pruned
            # point lookup instead of a whole-file decode (measured at
            # 3.9M turns: default layout left single ~1.7M-row groups
            # and the reference set paid 371 ms of sidecar reads cold
            # / 2.2 s in-session; 2 MiB groups cut that to 235 ms /
            # 0.9 s at +7% storage — constants doc above)
            .option("parquet.block.size", str(PC_BOUNDS_ROW_GROUP_BYTES))
            .parquet(os.path.join(index_dir, "pc_bounds")))
        mf.mark(index_dir, "pc_bounds", [-1], "done")
        mf.record_metrics(index_dir, run_id, "pc_bounds",
                          [(-1, "seconds", time.time() - t0)])

    def _job_positions():
        # Positional postings: the staged runs ARE the table — one
        # cheap exchange onto the deterministic (term_bucket,
        # term-hash split) layout, no decode/re-encode (phrase
        # queries re-rank candidates from scratch, so canonical
        # block-max blocks buy nothing here).  Runs of one term have
        # disjoint doc ranges (buckets and chunks partition the
        # doc_id space), so the (term, first_doc_id) in-partition
        # sort makes the written bytes parallelism-invariant exactly
        # like the postings table.
        t0 = time.time()
        pos_runs = run_rows.select(
            "term", "first_doc_id", "last_doc_id", "n_docs",
            "deltas", "tfs", "dls", "pdeltas").withColumn(
                "term_bucket", term_bucket_expr(n_term_buckets))
        split = F.abs(F.hash("term")) % POSTINGS_FILES_PER_BUCKET
        (pos_runs
         .withColumn("_split", split)
         .repartition(n_term_buckets * POSTINGS_FILES_PER_BUCKET,
                      "term_bucket", "_split")
         .drop("_split")
         .sortWithinPartitions("term", "first_doc_id")
         .write.mode("overwrite").partitionBy("term_bucket")
         .option("parquet.block.size", str(POSTINGS_ROW_GROUP_BYTES))
         .parquet(os.path.join(index_dir, "positions")))

    def _job_positions_empty():
        # standalone zero-term corpus: schema-only flat empty table so
        # the index still opens (mirrors _job_postings_empty)
        if doc_id_offset == 0:
            spark.createDataFrame([], POSITIONS_SCHEMA_DDL) \
                .write.mode("overwrite") \
                .parquet(os.path.join(index_dir, "positions"))

    def _job_postings_with_sidecar():
        # the sidecar chains onto the postings thread so it overlaps
        # with the docs/stats jobs instead of running as a lone
        # sequential stage after the whole concurrent group
        _job_postings()
        _build_pc_bounds()

    def _job_postings_empty():
        # allow_empty path, zero terms: a partitionBy write of an
        # empty frame leaves a fileless dir no reader can open, so
        # the hive-layout write is skipped either way.  For a
        # STANDALONE build (doc_id_offset == 0 — a fresh allow_empty
        # build or compact() over a live corpus whose text was all
        # blanked) the index must still OPEN, so schema-only flat
        # empty tables are written instead: term_bucket is a physical
        # column there, every query filter matches zero rows, and
        # FTSIndex/`_pc_bounds_pdf` read them like any other index.
        # A DELTA segment (doc_id_offset > 0) writes neither — its
        # files get adopted into the base's hive-partitioned dirs,
        # where a root-level flat file would break partition
        # discovery; adoption walks whatever files exist.
        if doc_id_offset == 0:
            spark.createDataFrame([], POSTINGS_SCHEMA_DDL) \
                .write.mode("overwrite") \
                .parquet(os.path.join(index_dir, "postings"))
            spark.createDataFrame(
                [], "term string, term_bucket int, pc long, mtf double") \
                .write.mode("overwrite") \
                .parquet(os.path.join(index_dir, "pc_bounds"))
        mf.mark(index_dir, "pc_bounds", [-1], "done")

    job_list = [("stats", _job_stats), ("docs", _job_docs),
                ("postings", _job_postings_with_sidecar if total_tf
                 else _job_postings_empty)]
    if positions:
        job_list.append(("positions", _job_positions if total_tf
                         else _job_positions_empty))
    jobs = [(stage, fn) for stage, fn in job_list
            if -1 not in mf.done_partitions(index_dir, stage)]
    if jobs:
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            futures = [(stage, ex.submit(fn)) for stage, fn in jobs]
            for stage, fut in futures:
                fut.result()
                mf.mark(index_dir, stage, [-1], "done")
                mf.record_metrics(
                    index_dir, run_id, stage,
                    [(-1, "seconds", time.time() - t0)]
                    + ([(-1, "n_docs", float(n_docs))]
                       if stage == "stats" else []))

    # crash-recovery path: a resume that finds 'postings' already done
    # skips the concurrent group, but the sidecar may still be missing
    # (crash between the postings write and the sidecar write)
    if -1 not in mf.done_partitions(index_dir, "pc_bounds"):
        _build_pc_bounds()

    total = time.time() - t_start
    # Bookkeeping for incremental maintenance (see incremental.py):
    # where the next delta segment's doc_ids start, and the smallest
    # avgdl any live posting blocks were encoded with (block-max bound
    # correction stays admissible as the corpus avgdl drifts).
    config["next_doc_id"] = doc_id_offset + n_docs
    config["corpus"] = {"n_docs": n_docs, "total_dl": total_dl}
    prev_min = config.get("min_encode_avgdl")
    config["min_encode_avgdl"] = (
        avgdl if prev_min is None else min(float(prev_min), avgdl))
    if doc_id_offset == 0:
        # the avgdl the BASE postings blocks were encoded with —
        # merge_segments re-derives the bound floor from this after
        # it drops every delta segment (incremental.py)
        config["base_encode_avgdl"] = avgdl
    mf.save_config(index_dir, config)
    mf.record_metrics(index_dir, run_id, "build",
                      [(-1, "seconds", total),
                       (-1, "docs_per_sec", n_docs / max(total, 1e-9))])
    return {"run_id": run_id, "index_dir": index_dir, "n_docs": n_docs,
            "avgdl": avgdl, "total_dl": total_dl, "seconds": total}

"""Incremental index maintenance — delta segments, tombstones, compaction.

The Spark restatement of the reference's online-update machinery:

* the persistent update queue dispatches typed posting/comment add /
  update / delete operations into the index (reference:
  scanner/UpdateQueue.java:53-137; rest/notification/processor/
  SearchProcessor.java:59-117),
* ``Index.index`` inserts, ``Index.update`` patches,
  ``Index.delete``/``deleteBulk`` remove documents (reference:
  index/Index.java:131-158,191-224),
* re-ingest of an unchanged revision is skipped (revision dedup,
  reference: scanner/ingest/PostingIngest.java:140-146,177-184).

Underneath the reference, OpenSearch/Lucene implements those
operations as **append-only segments plus a deleted-docs bitmap**,
merged later.  This module mirrors that model explicitly, because it
is also the right shape for a 100-TB Spark index (append new parquet
files; never rewrite the big tables in place):

* ``apply_updates``  — one delta batch: revision-dedup'd upserts
  become a new *segment* (a mini index build with doc_ids continuing
  after ``next_doc_id``, reusing the checkpoint-resumable build
  machinery) whose parquet files are adopted into the same
  postings / docs / term_stats directories; replaced and deleted
  doc_ids are appended to a ``_tombstones`` table (the live-docs
  bitmap analogue).  Batches are identified by ``batch_id`` and
  exactly-once: re-applying a recorded batch is a no-op (the
  queue-dedup analogue).
* ``merge_segments`` — TIERED merge: consolidate every delta segment
  (and the delta-side tombstones they accumulated) into ONE fresh
  segment, without touching the base index files.  Cost is
  proportional to the DELTA size, not the corpus — the everyday merge
  at 10^12-turn scale, where ``compact`` would rewrite ~50 TB of base
  postings to reclaim GBs of deltas.  The Lucene analogue is a
  background merge of the small segments in one tier while the big
  bottom-tier segment is left alone.
* ``compact``        — full rebuild from live docs (the forced-merge
  analogue): re-densifies doc_ids, drops tombstones, restores df
  exactness.

Scoring semantics under deltas (documented contract, Lucene-faithful):

* ``N`` and ``avgdl`` are **live** (tombstoned docs excluded) —
  updated exactly on every batch from per-segment totals;
* ``df`` is the **sum over segments** and is *not* decremented by
  tombstones until ``compact`` — exactly as Lucene keeps postings of
  deleted docs until merge;
* tombstoned docs can never appear in results (anti-joined out before
  top-k);
* block-max bounds stay admissible as avgdl drifts: every segment's
  blocks were encoded with that segment's avgdl; since tfnorm is
  increasing in avgdl, bounds are scaled at query time by
  ``max(1, avgdl_now / min_encode_avgdl)`` (see FTSIndex).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import time

from . import manifest as mf
from .build import build_index

KEYS = ["conv_id", "turn_idx"]
CONTENT_COLS = ["role", "tool", "ts", "text"]
TOMBSTONES = "_tombstones"


def _fs_token(batch_id: str) -> str:
    """Filesystem token for a caller-supplied batch id.

    Artifact cleanup sweeps files by the prefix ``seg-<id>-`` /
    ``batch-<id>-``, so one id must never be a file-prefix of another
    (``'b1'`` vs ``'b1-retry'`` would let b1's retry sweep delete
    b1-retry's committed segment files).  The token is the sanitized
    id plus a 12-hex digest of the FULL id: the digest is fixed-width
    and the sanitized part contains no ``.``, so no token (plus its
    ``-`` delimiter) can prefix a different token (ADVICE round 2)."""
    if not batch_id:
        raise ValueError("batch_id must be a non-empty string")
    safe = re.sub(r"[^A-Za-z0-9_]", "_", batch_id)[:48]
    dig = hashlib.sha1(batch_id.encode("utf-8")).hexdigest()[:12]
    return f"{safe}.{dig}"


def _tombstones_df(spark, index_dir: str):
    """Tombstoned doc_ids as a DataFrame, or None when there are none."""
    path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)):
        return None
    return spark.read.parquet(path).select("doc_id")


# pc_bounds rides along: a delta segment's per-(term, pc) bound rows
# land in the same sidecar dirs, and the query-side driver read takes
# the max across segment rows — bounds stay admissible over deltas.
SEG_SUBDIRS = ("docs", "term_stats", "postings", "pc_bounds",
               "positions")   # positions dir exists only for
                              # positional indexes; the adopt/
                              # cleanup walks skip missing dirs


def _is_flat_placeholder(name: str) -> bool:
    """Root-level schema-only placeholder files: the flat empty tables
    a fully-blanked standalone build writes (``part-*.parquet``), or
    the token-prefixed ones ``merge_segments`` writes
    (``seg-<tok>-placeholder.parquet`` — token-named so an interrupted
    merge's ``recover()`` can identify and remove them)."""
    return name.endswith(".parquet") and (
        not name.startswith("seg-")
        or name.endswith("-placeholder.parquet"))


def _clear_flat_placeholders(src_root: str, dst_root: str, remove) -> None:
    """When a segment brings hive-partitioned files, the table's flat
    root-level placeholder (if any) is obsolete — leaving it would mix
    root-level leaf files with term_bucket= dirs (readable on current
    Spark/pyarrow, but unspecified layout territory).  ``remove`` is
    the disposal policy: ``os.remove`` on the adoption path, move-to-
    trash on the journaled merge path (so a rollback restores it)."""
    if not (os.path.isdir(dst_root) and os.path.isdir(src_root)):
        return
    if not any(e.startswith("term_bucket=") for e in os.listdir(src_root)):
        return
    for e in list(os.listdir(dst_root)):
        fp = os.path.join(dst_root, e)
        if os.path.isfile(fp) and _is_flat_placeholder(e):
            crc = os.path.join(dst_root, f".{e}.crc")
            if os.path.isfile(crc):
                os.remove(crc)
            remove(fp)


def _promote_staged_files(tmp_dir: str, dst_dir: str,
                          name_prefix: str) -> int:
    """Move a staging directory's parquet files into ``dst_dir`` under
    deterministic ``<name_prefix><seq>.parquet`` names (retries
    overwrite instead of appending duplicates).  Returns the count."""
    os.makedirs(dst_dir, exist_ok=True)
    i = 0
    for f in sorted(os.listdir(tmp_dir)):
        if f.endswith(".parquet"):
            os.replace(os.path.join(tmp_dir, f),
                       os.path.join(dst_dir,
                                    f"{name_prefix}{i:05d}.parquet"))
            i += 1
    return i


def _adopt_segment_files(seg_dir: str, index_dir: str, batch_id: str,
                         subdirs: tuple[str, ...] = SEG_SUBDIRS) -> None:
    """Move a finished segment's parquet files into the main index
    directories (append-only adoption).  Names are derived from the
    batch id's filesystem token + a per-directory sequence number —
    deterministic across retries, so together with
    ``_cleanup_batch_artifacts`` a re-run of a crashed batch can never
    leave two live copies.  On object storage this is the same cheap
    metadata operation Iceberg's append commit performs."""
    tok = _fs_token(batch_id)
    for sub in subdirs:
        src_root = os.path.join(seg_dir, sub)
        dst_root = os.path.join(index_dir, sub)
        _clear_flat_placeholders(src_root, dst_root, os.remove)
        for root, dirs, files in os.walk(src_root):
            dirs.sort()
            rel = os.path.relpath(root, src_root)
            dst = dst_root if rel == "." else os.path.join(dst_root, rel)
            os.makedirs(dst, exist_ok=True)
            for i, f in enumerate(sorted(files)):
                if not f.endswith(".parquet"):
                    continue
                os.replace(os.path.join(root, f),
                           os.path.join(dst,
                                        f"seg-{tok}-{i:05d}.parquet"))


def _cleanup_batch_artifacts(index_dir: str, batch_id: str) -> None:
    """Remove every on-disk artifact a crashed attempt of ``batch_id``
    may have left (temp dirs, per-batch tombstone files, adopted
    segment files).  Called before re-applying an unrecorded batch:
    the mutation sequence below is not atomic, but after this sweep the
    index is back to its exact pre-batch state, so apply_updates as a
    whole is idempotent — the atomic config save is the commit point."""
    tok = _fs_token(batch_id)
    shutil.rmtree(os.path.join(index_dir, f"_seg_{tok}"),
                  ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, f"_tomb_{tok}"),
                  ignore_errors=True)
    tomb_dir = os.path.join(index_dir, TOMBSTONES)
    if os.path.isdir(tomb_dir):
        for f in os.listdir(tomb_dir):
            if f.startswith(f"batch-{tok}-"):
                os.remove(os.path.join(tomb_dir, f))
    prefix = f"seg-{tok}-"
    for sub in SEG_SUBDIRS:
        for root, _dirs, files in os.walk(os.path.join(index_dir, sub)):
            for f in files:
                if f.startswith(prefix):
                    os.remove(os.path.join(root, f))


def _adopt_tombstones(spark, index_dir: str, batch_id: str, doomed) -> None:
    """Write this batch's tombstoned doc_ids as deterministically-named
    files under ``_tombstones`` (batch-<id>-<seq>.parquet) so a retry
    overwrites instead of appending duplicates."""
    tok = _fs_token(batch_id)
    tmp = os.path.join(index_dir, f"_tomb_{tok}")
    doomed.select("doc_id").write.mode("overwrite").parquet(tmp)
    _promote_staged_files(tmp, os.path.join(index_dir, TOMBSTONES),
                          f"batch-{tok}-")
    shutil.rmtree(tmp, ignore_errors=True)


def _write_corpus_stats(index_dir: str, n_docs: int, total_dl: int) -> None:
    import pandas as pd

    from .build import _single_parquet

    avgdl = (total_dl / n_docs) if n_docs else 0.0
    pd.DataFrame([{"n_docs": n_docs, "avgdl": avgdl,
                   "total_dl": total_dl}]).to_parquet(
        _single_parquet(index_dir, "corpus_stats"), index=False)


def apply_updates(spark, index_dir: str, upserts=None, deletes=None, *,
                  batch_id: str, skip_unchanged: bool = True,
                  n_buckets: int = 8) -> dict:
    """Apply one delta batch to a built index.

    ``upserts``: DataFrame in the transcripts schema (conv_id,
    turn_idx, role, text, tool, ts) — new turns and new revisions of
    existing turns.  Unchanged revisions are skipped when
    ``skip_unchanged`` (the reference's revision dedup).
    ``deletes``: DataFrame with (conv_id, turn_idx) keys to remove.
    Returns batch stats; a no-op (with ``"skipped": True``) when
    ``batch_id`` was already applied.
    """
    from pyspark.sql import functions as F

    if batch_id.startswith(("_merge.", "_compact.")):
        raise ValueError(
            f"batch_id {batch_id!r} uses a reserved prefix — '_merge.' "
            "and '_compact.' name the synthetic lineage entries "
            "merge_segments/compact write, and the merge policy keys "
            "on them")
    t0 = time.time()
    config = mf.load_config(index_dir)
    if config is None:
        raise FileNotFoundError(f"no build config at {index_dir}")
    recover(index_dir)   # heal an interrupted merge; sweep merge garbage
    config = mf.load_config(index_dir)
    # exactly-once across merges: a merged lineage entry carries every
    # historical batch id it absorbed (transitively), so re-applying a
    # long-merged batch is still detected as a duplicate
    applied = set()
    for b in config.get("delta_batches", []):
        applied.add(b["batch_id"])
        applied.update(b.get("merged", []))
    if batch_id in applied:
        # Batch committed; heal the derived corpus_stats cache in case
        # the previous attempt crashed between commit and cache write.
        if "corpus" in config:
            _write_corpus_stats(index_dir, int(config["corpus"]["n_docs"]),
                                int(config["corpus"]["total_dl"]))
        return {"batch_id": batch_id, "skipped": True}

    # Unrecorded batch: sweep any artifacts a crashed attempt left so
    # the mutations below start from the exact pre-batch state.
    _cleanup_batch_artifacts(index_dir, batch_id)

    if "corpus" in config:
        n_live = int(config["corpus"]["n_docs"])
        total_dl = int(config["corpus"]["total_dl"])
    else:   # index built before corpus moved into config
        import pandas as pd

        corpus = pd.read_parquet(
            os.path.join(index_dir, "corpus_stats")).iloc[0]
        n_live, total_dl = int(corpus["n_docs"]), int(corpus["total_dl"])

    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    tomb = _tombstones_df(spark, index_dir)
    live = docs if tomb is None else docs.join(tomb, "doc_id", "left_anti")

    # -- resolve which live docs this batch replaces or deletes --------
    doomed_parts = []
    if deletes is not None:
        doomed_parts.append(
            live.join(F.broadcast(deletes.select(*KEYS).distinct()),
                      KEYS, "left_semi").select("doc_id", "dl"))

    changed = None
    if upserts is not None:
        cur = live.join(F.broadcast(upserts.select(*KEYS).distinct()),
                        KEYS, "left_semi") \
            .select("doc_id", "dl", *KEYS, *CONTENT_COLS)
        cmp = upserts.alias("u").join(
            F.broadcast(cur.alias("c")), KEYS, "left")
        same = (F.col("c.doc_id").isNotNull()
                & F.col("u.role").eqNullSafe(F.col("c.role"))
                & F.col("u.tool").eqNullSafe(F.col("c.tool"))
                & F.col("u.ts").eqNullSafe(F.col("c.ts"))
                & F.col("u.text").eqNullSafe(F.col("c.text")))
        keep_pred = ~same if skip_unchanged else F.lit(True)
        changed = cmp.where(keep_pred).select("u.*")
        # old revisions of changed keys get tombstoned
        doomed_parts.append(
            cmp.where(F.col("c.doc_id").isNotNull() & keep_pred)
            .select(F.col("c.doc_id").alias("doc_id"),
                    F.col("c.dl").alias("dl")))

    n_doomed, dl_doomed = 0, 0
    if doomed_parts:
        doomed = doomed_parts[0]
        for p in doomed_parts[1:]:
            doomed = doomed.unionByName(p)
        doomed = doomed.dropDuplicates(["doc_id"])
        agg = doomed.agg(F.count("*").alias("n"),
                         F.sum("dl").alias("dl")).collect()[0]
        n_doomed, dl_doomed = int(agg["n"]), int(agg["dl"] or 0)
        if n_doomed:
            _adopt_tombstones(spark, index_dir, batch_id, doomed)

    # -- build the delta segment (a mini index with offset doc_ids) ----
    next_id = int(config.get("next_doc_id", n_live))
    seg_docs = seg_dl = 0
    seg_avgdl = None
    if changed is not None and changed.count() == 0:
        changed = None   # everything dedup'd away — no segment
    if changed is not None:
        seg_dir = os.path.join(index_dir, f"_seg_{_fs_token(batch_id)}")
        shutil.rmtree(seg_dir, ignore_errors=True)
        res = build_index(
            spark, changed, seg_dir, mode=config["mode"],
            n_buckets=n_buckets, k1=config["k1"], b=config["b"],
            block_size=config["block_size"],
            chunk_size=config["chunk_size"],
            n_term_buckets=config.get("n_term_buckets", 16),
            doc_id_offset=next_id,
            # positional base index ⇒ positional segments (phrase
            # queries must see upserted docs too)
            positions=bool(config.get("positions", False)),
            # a batch whose changed docs ALL tokenize to zero terms
            # (text blanked to whitespace/stopwords) is legitimate
            # here: tombstones are already adopted above, so the
            # fresh-build zero-term failure would strand the batch
            # mid-apply; an empty segment (docs only, no postings)
            # is the correct outcome
            allow_empty=True)
        seg_docs, seg_avgdl = res["n_docs"], res["avgdl"]
        seg_dl = int(res["total_dl"])
        if seg_docs:
            _adopt_segment_files(seg_dir, index_dir, batch_id)
        shutil.rmtree(seg_dir, ignore_errors=True)

    # -- stats + lineage (commit point) -------------------------------
    # Everything above is idempotent given the pre-batch state (the
    # entry sweep removes partial artifacts); this single atomic config
    # save commits the batch: lineage, next_doc_id, and the corpus
    # stats all land together.  The corpus_stats parquet is a derived
    # cache written after the commit (healed on the skip path).
    new_n = n_live - n_doomed + seg_docs
    new_dl = total_dl - dl_doomed + seg_dl
    config = mf.load_config(index_dir)   # fresh copy before mutating
    config.setdefault("delta_batches", []).append({
        "batch_id": batch_id, "upserts_indexed": seg_docs,
        "tombstoned": n_doomed,
        "first_doc_id": next_id if seg_docs else None})
    config["next_doc_id"] = next_id + seg_docs
    config["corpus"] = {"n_docs": new_n, "total_dl": new_dl}
    if seg_docs and seg_avgdl:
        prev = config.get("min_encode_avgdl")
        config["min_encode_avgdl"] = (
            seg_avgdl if prev is None else min(float(prev), seg_avgdl))
    mf.save_config(index_dir, config)
    _write_corpus_stats(index_dir, new_n, new_dl)
    mf.mark(index_dir, f"delta_{batch_id}", [-1], "done",
            rows_in={-1: seg_docs}, terms_out={-1: n_doomed})
    mf.record_metrics(index_dir, f"delta_{batch_id}", "delta",
                      [(-1, "seconds", time.time() - t0),
                       (-1, "docs_indexed", seg_docs),
                       (-1, "tombstoned", n_doomed)])
    return {"batch_id": batch_id, "skipped": False,
            "docs_indexed": seg_docs, "tombstoned": n_doomed,
            "seconds": time.time() - t0}


MERGE_TRASH = "_merge_trash_"


def _placeholder_ddls(positions: bool) -> list[tuple[str, str]]:
    """(table, schema DDL) for every index table that must stay
    readable even when it holds zero rows (mirrors build.py's
    standalone allow_empty placeholders)."""
    from .build import POSITIONS_SCHEMA_DDL, POSTINGS_SCHEMA_DDL

    out = [
        ("postings", POSTINGS_SCHEMA_DDL),
        ("pc_bounds", "term string, term_bucket int, pc long, mtf double"),
        ("term_stats", "term string, df long"),
        ("docs", "doc_id long, conv_id string, turn_idx int, role string, "
                 "tool string, ts timestamp, dl int, text string"),
    ]
    if positions:
        out.append(("positions", POSITIONS_SCHEMA_DDL))
    return out


def _dir_has_parquet(root: str) -> bool:
    for r, _d, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _ensure_placeholders(spark, index_dir: str, positions: bool,
                         token: str) -> None:
    """After a merge removed segment files, any index table left with
    ZERO parquet files gets a schema-only flat placeholder so the
    index still opens (only reachable when the base itself was an
    empty standalone build — build.py's allow_empty layout notes).

    The placeholder is written non-destructively into the existing
    directory under a token-derived name
    (``seg-<token>-placeholder.parquet``) so an interrupted merge's
    ``recover()`` can remove it by prefix — keeping the whole
    journaled window reversible.  Adoption recognizes the
    ``-placeholder.parquet`` suffix and drops it the moment a segment
    brings real hive-partitioned files (``_is_flat_placeholder``)."""
    for name, ddl in _placeholder_ddls(positions):
        root = os.path.join(index_dir, name)
        if not (os.path.isdir(root) and not _dir_has_parquet(root)):
            continue
        tmp = os.path.join(index_dir, f"_seg_{token}_ph_{name}")
        shutil.rmtree(tmp, ignore_errors=True)
        # repartition(1) forces exactly one (schema-only) output file
        # even for a zero-partition empty frame
        spark.createDataFrame([], ddl).repartition(1) \
            .write.mode("overwrite").parquet(tmp)
        moved = 0
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet"):
                os.replace(
                    os.path.join(tmp, f),
                    os.path.join(root,
                                 f"seg-{token}-placeholder.parquet"))
                moved = 1
                break
        shutil.rmtree(tmp, ignore_errors=True)
        if not moved:
            raise RuntimeError(
                f"empty-frame write produced no parquet file for {name}")


def recover(index_dir: str) -> dict:
    """Roll back an interrupted ``merge_segments`` (and sweep any
    garbage a committed one left), restoring the exact pre-merge
    index.  Idempotent; a no-op on a healthy index.

    The merge journals its intent in the build config
    (``pending_merge``) BEFORE mutating shared directories, and every
    mutation is reversible until the final atomic config save: old
    files are MOVED to a trash directory (never deleted), new files
    carry the merge token as a name prefix.  Rollback = delete the
    token-prefixed files, move the trash back, clear the marker —
    the same sweep-then-redo idempotence contract ``apply_updates``
    uses (reference analogue: job/Job.java:150-154 checkpoint +
    retry)."""
    config = mf.load_config(index_dir)
    if config is None:
        raise FileNotFoundError(f"no build config at {index_dir}")
    pm = config.get("pending_merge")
    if pm is None:
        # Committed or never-started merges can leave only garbage:
        # trash dirs (crash between the commit save and the trash
        # rmtree) and temp segment/tombstone staging dirs (crash
        # before the journal entry — a retried merge over a changed
        # batch set gets a new token, so per-token cleanup would miss
        # them).  Also covers apply_updates' own staging dirs, whose
        # per-batch sweep misses a batch never retried.  Safe under
        # the engine's single-writer contract: every entry point runs
        # this BEFORE creating its own staging dirs.
        swept = 0
        for e in list(os.listdir(index_dir)):
            if e.startswith((MERGE_TRASH, "_seg_", "_tomb_")):
                shutil.rmtree(os.path.join(index_dir, e),
                              ignore_errors=True)
                swept += 1
        return {"rolled_back": False, "swept_dirs": swept}

    tok = pm["token"]
    # 1. adopted merge outputs are token-prefixed — remove them
    for sub in SEG_SUBDIRS:
        root = os.path.join(index_dir, sub)
        for r, _d, files in os.walk(root):
            for f in files:
                if f.startswith(f"seg-{tok}-"):
                    os.remove(os.path.join(r, f))
    tomb_dir = os.path.join(index_dir, TOMBSTONES)
    if os.path.isdir(tomb_dir):
        for f in list(os.listdir(tomb_dir)):
            if f.startswith(f"batch-{tok}-"):
                os.remove(os.path.join(tomb_dir, f))
    # 2. restore every trashed file to its original relative path
    trash = os.path.join(index_dir, pm["trash"])
    if os.path.isdir(trash):
        for r, _d, files in os.walk(trash):
            rel = os.path.relpath(r, trash)
            dst = index_dir if rel == "." else os.path.join(index_dir, rel)
            os.makedirs(dst, exist_ok=True)
            for f in files:
                os.replace(os.path.join(r, f), os.path.join(dst, f))
        shutil.rmtree(trash, ignore_errors=True)
    # 3. temp artifacts + journal entry (prefix sweep: covers the
    # segment build dir, the staged-tombstone dir, and the
    # placeholder staging dirs alike)
    for e in list(os.listdir(index_dir)):
        if e.startswith(("_seg_", "_tomb_")):
            shutil.rmtree(os.path.join(index_dir, e), ignore_errors=True)
    config = mf.load_config(index_dir)
    config.pop("pending_merge", None)
    mf.save_config(index_dir, config)
    return {"rolled_back": True, "token": tok}


def merge_segments(spark, index_dir: str, *,
                   n_buckets: int | str = "auto") -> dict:
    """Tiered segment merge: consolidate ALL delta segments into one.

    Decodes nothing from the base index — reads the delta docs (every
    ``docs`` row with ``doc_id >= first_delta_id``), drops the
    tombstoned ones, and rebuilds them as a single fresh segment via
    the normal mini-build, then atomically swaps it in for the old
    segment files.  Effects, exactly Lucene's merge-of-small-segments:

    * file count drops from O(batches × buckets) to one segment's
      worth — query-time listing and per-file decode overhead shrink;
    * ``df`` becomes EXACT again for every delta posting (tombstoned
      delta docs' postings are physically dropped); base df stays as
      built (base tombstones wait for ``compact``);
    * delta-side tombstones are reclaimed (only tombstones pointing
      at base docs survive);
    * delta doc_ids are re-densified from ``first_delta_id`` under
      stable (conv_id, turn_idx) order; ``next_doc_id`` shrinks
      accordingly (freed ids are reused by later batches);
    * live N / avgdl / every query result over live docs that a
      fresh-build index would return are unchanged — pytest pins
      post-merge output equal to an index where the surviving delta
      docs were applied as one batch.

    Scale contract: runtime and shuffle are proportional to the LIVE
    DELTA corpus only.  At the 10^12-turn design point the base is
    ~50 TB of postings and a day of deltas is GBs — this is the merge
    you run hourly, with ``compact`` reserved for df re-densification
    of the base.

    Crash-safe via a journal + trash protocol (see ``recover``): any
    interruption rolls back to the exact pre-merge index; the final
    config save is the commit point.
    """
    from pyspark.sql import functions as F

    t0 = time.time()
    config = mf.load_config(index_dir)
    if config is None:
        raise FileNotFoundError(f"no build config at {index_dir}")
    recover(index_dir)
    config = mf.load_config(index_dir)

    batches = config.get("delta_batches", [])
    if not batches:
        return {"skipped": True, "reason": "no delta batches"}
    first_ids = [b["first_doc_id"] for b in batches
                 if b.get("first_doc_id") is not None]
    if not first_ids:
        if len(batches) == 1:
            return {"skipped": True, "reason": "no delta docs"}
        # delete-only lineage: no doc-bearing segments exist, but the
        # per-batch tombstone files and lineage entries still pile up
        # — consolidate them (the generic path below degenerates to a
        # tombstone rewrite + lineage collapse when no doc_id can be
        # delta-side)
        first_delta_id = int(config.get("next_doc_id", 0))
    else:
        first_delta_id = int(min(first_ids))

    tomb = _tombstones_df(spark, index_dir)
    n_delta_tomb = 0
    if tomb is not None:
        n_delta_tomb = tomb.filter(
            F.col("doc_id") >= first_delta_id).count()
    if (len(batches) == 1
            and str(batches[0]["batch_id"]).startswith("_merge.")
            and n_delta_tomb == 0):
        return {"skipped": True, "reason": "already merged"}

    # carry every absorbed batch id TRANSITIVELY — apply_updates'
    # exactly-once check reads this list after the lineage collapses
    merged_ids = []
    for b in batches:
        merged_ids.extend(str(x) for x in b.get("merged", []))
        merged_ids.append(str(b["batch_id"]))
    merged_id = "_merge." + hashlib.sha1(
        "\x00".join(merged_ids).encode("utf-8")).hexdigest()[:16]
    tok = _fs_token(merged_id)
    # deterministic names ⇒ a retried merge must first sweep anything
    # a previous attempt adopted (recover() above handled journaled
    # attempts; this handles a crash before the journal entry)
    _cleanup_batch_artifacts(index_dir, merged_id)

    # ---- read-only phase: build the merged segment in a temp dir ----
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    live_delta = docs.filter(F.col("doc_id") >= first_delta_id)
    if tomb is not None:
        live_delta = live_delta.join(tomb, "doc_id", "left_anti")
    live_delta = live_delta.select(*KEYS, *CONTENT_COLS)

    positions = bool(config.get("positions", False))
    seg_dir = os.path.join(index_dir, f"_seg_{tok}")
    shutil.rmtree(seg_dir, ignore_errors=True)
    n_merged, merged_avgdl = 0, None
    if live_delta.limit(1).count():
        res = build_index(
            spark, live_delta, seg_dir, mode=config["mode"],
            n_buckets=n_buckets, k1=config["k1"], b=config["b"],
            block_size=config["block_size"],
            chunk_size=config["chunk_size"],
            n_term_buckets=config.get("n_term_buckets", 16),
            doc_id_offset=first_delta_id, positions=positions,
            allow_empty=True)
        n_merged, merged_avgdl = int(res["n_docs"]), res["avgdl"]

    # surviving (base-side) tombstones, staged to a temp dir before
    # any mutation — the rewrite below must not re-read moved files
    tomb_tmp = os.path.join(index_dir, f"_tomb_{tok}")
    n_base_tomb = 0
    if tomb is not None:
        base_tomb = tomb.filter(F.col("doc_id") < first_delta_id)
        n_base_tomb = base_tomb.count()
        if n_base_tomb:
            # part of the merge's point is file consolidation — size
            # the output by rows, not by however many per-batch files
            # the reads spanned (8 B/doc_id: one file per ~50M deletes)
            n_files = max(1, n_base_tomb // 50_000_000)
            base_tomb.select("doc_id").coalesce(n_files) \
                .write.mode("overwrite").parquet(tomb_tmp)

    # ---- journaled swap (reversible until the final config save) ----
    trash_name = f"{MERGE_TRASH}{tok}"
    trash = os.path.join(index_dir, trash_name)
    config = mf.load_config(index_dir)
    config["pending_merge"] = {"token": tok, "trash": trash_name}
    mf.save_config(index_dir, config)

    def _to_trash(path: str) -> None:
        rel = os.path.relpath(path, index_dir)
        dst = os.path.join(trash, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(path, dst)

    # old segment files (every seg-* file is delta-owned: adoption is
    # the only writer of that prefix) and old tombstone batch files
    for sub in SEG_SUBDIRS:
        root = os.path.join(index_dir, sub)
        for r, _d, files in os.walk(root):
            for f in sorted(files):
                if f.startswith("seg-") and f.endswith(".parquet"):
                    _to_trash(os.path.join(r, f))
    tomb_dir = os.path.join(index_dir, TOMBSTONES)
    if os.path.isdir(tomb_dir):
        for f in sorted(os.listdir(tomb_dir)):
            if f.startswith("batch-") and f.endswith(".parquet"):
                _to_trash(os.path.join(tomb_dir, f))
    # a base-placeholder flat file would be DELETED by adoption when
    # the merged segment brings hive dirs; trash it instead so a
    # rollback can restore it (only exists over an empty base build)
    if n_merged:
        for sub in ("postings", "pc_bounds", "positions"):
            _clear_flat_placeholders(os.path.join(seg_dir, sub),
                                     os.path.join(index_dir, sub),
                                     _to_trash)

    if n_merged:
        _adopt_segment_files(seg_dir, index_dir, merged_id)
    shutil.rmtree(seg_dir, ignore_errors=True)
    if n_base_tomb:
        _promote_staged_files(tomb_tmp, tomb_dir, f"batch-{tok}-")
    shutil.rmtree(tomb_tmp, ignore_errors=True)
    # Placeholders are written INSIDE the journaled window but stay
    # reversible: they carry the merge token in their name
    # (seg-<tok>-placeholder.parquet), so recover() removes them with
    # the rest of the token-prefixed outputs before restoring the
    # trash — rollback lands the byte-exact pre-merge layout.
    _ensure_placeholders(spark, index_dir, positions, tok)

    # ---- commit point: one atomic config save ----
    config = mf.load_config(index_dir)
    config["delta_batches"] = [{
        "batch_id": merged_id, "merged": merged_ids,
        "upserts_indexed": n_merged, "tombstoned": n_base_tomb,
        "first_doc_id": first_delta_id if n_merged else None}]
    config["next_doc_id"] = first_delta_id + n_merged
    # block-max encode floor: the merged segment replaces every old
    # delta segment, so the floor is re-derived from the base's own
    # encode avgdl (recorded by standalone builds) + the merged
    # segment's — merges partially RESTORE bound tightness.  Older
    # indexes without the base record keep the conservative min.
    cands = []
    base_enc = config.get("base_encode_avgdl")
    prev_min = config.get("min_encode_avgdl")
    if base_enc is not None:
        cands.append(float(base_enc))
    elif prev_min is not None:
        cands.append(float(prev_min))
    if n_merged and merged_avgdl:
        cands.append(float(merged_avgdl))
    if cands:
        config["min_encode_avgdl"] = min(cands)
    config.pop("pending_merge", None)
    mf.save_config(index_dir, config)

    shutil.rmtree(trash, ignore_errors=True)
    mf.mark(index_dir, f"merge_{merged_id}", [-1], "done",
            rows_in={-1: n_merged}, terms_out={-1: n_delta_tomb})
    mf.record_metrics(index_dir, f"merge_{merged_id}", "merge",
                      [(-1, "seconds", time.time() - t0),
                       (-1, "docs_merged", n_merged),
                       (-1, "segments_merged", len(merged_ids)),
                       (-1, "delta_tombstones_reclaimed", n_delta_tomb)])
    return {"skipped": False, "batch_id": merged_id,
            "segments_merged": len(merged_ids), "docs_merged": n_merged,
            "delta_tombstones_reclaimed": n_delta_tomb,
            "base_tombstones_kept": n_base_tomb,
            "seconds": time.time() - t0}


def compact(spark, index_dir: str, *,
            n_buckets: int | str = "auto",
            positions: bool | None = None) -> dict:
    """Segment merge: rebuild the index from live docs only.

    Drops tombstones, re-densifies doc_ids under stable
    (conv_id, turn_idx) order, and restores exact df — the analogue of
    a Lucene forced merge.  The rebuilt index is bit-compatible with a
    fresh ``build_index`` over the live corpus.  ``n_buckets``
    defaults to "auto": the live corpus after heavy deletes can be far
    smaller (or, after many upsert batches, far larger) than whatever
    bucket count the original build used, so the compacted index
    re-derives task granularity from the data (build.py knee).

    ``positions`` overrides the positional-index flag for the rebuilt
    index (None = inherit the current config) — the supported way to
    ADD phrase support to an existing index without re-ingesting the
    source (compact already re-reads every live doc's text)."""
    t0 = time.time()
    config = mf.load_config(index_dir)
    if config is None:
        raise FileNotFoundError(f"no build config at {index_dir}")
    recover(index_dir)   # heal an interrupted merge; sweep merge garbage
    config = mf.load_config(index_dir)

    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    tomb = _tombstones_df(spark, index_dir)
    live = docs if tomb is None else docs.join(tomb, "doc_id", "left_anti")
    transcripts = live.select(*KEYS, *CONTENT_COLS)

    tmp = index_dir.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    res = build_index(
        spark, transcripts, tmp, mode=config["mode"], n_buckets=n_buckets,
        k1=config["k1"], b=config["b"], block_size=config["block_size"],
        chunk_size=config["chunk_size"],
        n_term_buckets=config.get("n_term_buckets", 16),
        positions=bool(config.get("positions", False))
        if positions is None else bool(positions),
        # the live corpus can be legitimately term-less (apply_updates
        # permits blanking every doc's text); the rebuild then writes
        # schema-only empty postings/pc_bounds (standalone allow_empty
        # path) so the compacted index still opens and tombstones are
        # actually reclaimed instead of compact() raising forever
        allow_empty=True)
    # Exactly-once across compactions: the fresh build forgot which
    # delta batches the old index had applied, so a late retry of a
    # pre-compact batch would double-apply.  Carry the full applied
    # set forward as one synthetic zero-doc lineage entry (same
    # mechanism merge_segments uses; first_doc_id None keeps it inert
    # for future merges).  Written into the TMP config BEFORE the
    # directory swap — the swap is the commit point, so the lineage
    # must already be inside what it commits (a post-swap write would
    # silently vanish on a crash in between).
    applied = []
    for b in config.get("delta_batches", []):
        applied.extend(str(x) for x in b.get("merged", []))
        applied.append(str(b["batch_id"]))
    if applied:
        tmp_config = mf.load_config(tmp)
        tmp_config["delta_batches"] = [{
            "batch_id": "_compact." + hashlib.sha1(
                "\x00".join(applied).encode("utf-8")).hexdigest()[:16],
            "merged": applied, "upserts_indexed": 0, "tombstoned": 0,
            "first_doc_id": None}]
        mf.save_config(tmp, tmp_config)

    old = index_dir.rstrip("/") + ".precompact"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(index_dir, old)
    os.replace(tmp, index_dir)
    shutil.rmtree(old, ignore_errors=True)
    return {"n_docs": res["n_docs"], "seconds": time.time() - t0}

"""Scheduled full-recompute jobs — the reference's periodic aggregate
refreshes restated as idempotent Spark batch jobs.

The reference refreshes popularity hourly and node activity /
closeness every 15 minutes from scratch (reference:
scanner/ingest/PostingIngest.java:249-268 recomputes popularity for
every posting; Workload.java:37-41 sets the periods; the zeroing pass
that precedes each refresh exists only because it patches values in
place — a full recompute into a fresh table makes it unnecessary,
SURVEY §2.4).

Spark-first shape: each refresh is ONE deterministic batch job that
recomputes the aggregate from source into a fresh generation directory
and atomically repoints the output path at it (symlink/pointer swap —
one rename), so readers never see a half-written table or a missing
path, and a crashed refresh leaves the previous generation live.  The timer itself belongs to the orchestrator
(cron / Airflow / Databricks jobs — the analogue of the reference's
``@Scheduled`` annotations); the periods to configure there are the
reference's own:

    popularity  — every 1 h   (Workload.java:37)
    activity    — every 15 min, ≤500 nodes/tick (Workload.java:20-27,39-41)

Aggregate definitions are shared with the operator catalog
(operators/relational.py, operators/scalar_funcs.py) so the DuckDB
oracles that verify the catalog entries verify these jobs too.
"""

from __future__ import annotations

import os
import shutil
import time

POPULARITY_PERIOD_S = 3600        # Workload.java:37
ACTIVITY_PERIOD_S = 900           # Workload.java:39-41


def _atomic_swap_write(df, out_path: str) -> None:
    """Write ``df`` as a new generation and atomically repoint
    ``out_path`` at it.

    Generations are immutable sibling directories
    (``<out>.gen-<N>``); ``out_path`` itself is a symlink to the live
    generation, swapped with ``symlink + os.replace`` — one atomic
    rename, so a concurrent reader of the plain path always resolves a
    complete generation and a crash at ANY point leaves the previous
    generation live (the round-2 two-rename swap had a window where
    the output path did not exist).  Older generations are GC'd after
    the swap; a crash before GC leaves an orphan ``.gen-*`` dir the
    next refresh removes.  On object storage (no symlinks) the same
    pattern is the pointer-file/manifest commit Iceberg snapshots use —
    swap a small pointer, never the data."""
    out_path = out_path.rstrip("/")
    parent = os.path.dirname(out_path) or "."
    base = os.path.basename(out_path)
    os.makedirs(parent, exist_ok=True)
    prior = sorted(d for d in os.listdir(parent)
                   if d.startswith(base + ".gen-"))
    n = 1 + max((int(d.rsplit("-", 1)[1]) for d in prior), default=-1)
    gen = f"{out_path}.gen-{n:06d}"
    df.write.mode("overwrite").parquet(gen)
    if os.path.lexists(out_path) and not os.path.islink(out_path):
        # one-time migration from a pre-generation layout: the old
        # directory must move aside before a symlink can take the name
        shutil.rmtree(out_path)
    tmp_link = f"{out_path}.swap"
    if os.path.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(os.path.basename(gen), tmp_link)
    os.replace(tmp_link, out_path)        # the atomic commit point
    for d in prior:
        shutil.rmtree(os.path.join(parent, d), ignore_errors=True)


def refresh_popularity(spark, events, out_dir: str, *,
                       now_ms: int) -> dict:
    """Full popularity recompute — the decayed two-track sums of
    PostingRepository.java:680-715, per user, written as the
    ``popularity`` stats table."""
    from .operators.relational import DECAY_HOURS
    from pyspark.sql import functions as F

    t0 = time.time()
    ratio = (F.lit(now_ms)
             - F.unix_millis(F.col("ts").cast("timestamp"))) / 3600000.0 \
        / DECAY_HOURS
    pop = F.col("value") * (1.0 - F.pow(ratio, 2))
    fad = F.greatest(F.col("value") * (1.0 - F.pow(ratio, 2) * 9.0),
                     F.lit(0.0))
    agg = events.groupBy("user_id").agg(
        F.sum(F.round(pop * 1e6).cast("long")).alias("popularity_e6"),
        F.sum(F.round(fad * 1e6).cast("long")).alias("fad_e6"))
    path = os.path.join(out_dir, "popularity")
    _atomic_swap_write(agg, path)
    return {"table": path, "seconds": time.time() - t0}


def refresh_activity(spark, events, out_dir: str) -> dict:
    """Full node-activity recompute — Σ (1 − (age_h/decayHours)²) over
    recent events per user (NodeRepository.java:595-617), written as
    the ``activity`` stats table."""
    from .operators.scalar_funcs import DECAY_HOURS
    from pyspark.sql import functions as F

    t0 = time.time()
    now = events.agg(F.max("ts").alias("now"))
    age_h = (F.unix_micros(F.col("now").cast("timestamp"))
             - F.unix_micros(F.col("ts").cast("timestamp"))) / 3.6e9
    contrib = 1.0 - F.pow(F.col("age_h") / DECAY_HOURS, 2)
    agg = (events.crossJoin(F.broadcast(now))
           .withColumn("age_h", age_h)
           .filter(F.col("age_h") < DECAY_HOURS)
           .groupBy("user_id")
           .agg(F.sum(F.round(contrib * 1e6).cast("long"))
                .alias("activity_e6")))
    path = os.path.join(out_dir, "activity")
    _atomic_swap_write(agg, path)
    return {"table": path, "seconds": time.time() - t0}

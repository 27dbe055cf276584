"""Build manifest — per-partition lineage, resume state, and metrics.

The analogue of the reference's durable-job checkpointing: a job
serializes its parameters and cursor state after every unit of work and
resumes from stored state after a crash (reference: job/Job.java:150-154
``checkpoint()``; job/Jobs.java:243-269 persists parameters+state JSON
to ``(:Job)`` nodes; scanner/updates/TimelineScanJob.java:120-123
checkpoints the feed cursor per story).

Here the unit of work is an input *bucket* (a conv_id range).  The
manifest is a parquet table of one row per (stage, bucket) attempt:

    _build_manifest(partition_id int, stage string, status string,
                    attempt int, rows_in long, terms_out long,
                    started_at timestamp, finished_at timestamp)

plus a JSON config blob (``_build_config.json``) pinning everything a
resumed build must agree on (bucket boundaries, analyzer mode, codec
parameters) so a resume is byte-identical to an uninterrupted build.

``build_metrics`` is a long-format parquet table
(run_id, stage, partition_id, metric, value) written once per stage.

Both are driver-written (tiny: O(buckets) rows) — the heavy lifting
stays in executor-side Spark jobs.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone

import pandas as pd

MANIFEST_COLS = ["partition_id", "stage", "status", "attempt", "rows_in",
                 "terms_out", "started_at", "finished_at"]


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_build_manifest.parquet")


def _metrics_path(index_dir: str) -> str:
    return os.path.join(index_dir, "build_metrics.parquet")


def _config_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_build_config.json")


def load_config(index_dir: str) -> dict | None:
    path = _config_path(index_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_config(index_dir: str, config: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = _config_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(config, f, indent=2, default=str)
    os.replace(tmp, _config_path(index_dir))


def load_manifest(index_dir: str) -> pd.DataFrame:
    path = _manifest_path(index_dir)
    if os.path.exists(path):
        return pd.read_parquet(path)
    return pd.DataFrame(columns=MANIFEST_COLS)


def _write_manifest(index_dir: str, pdf: pd.DataFrame) -> None:
    tmp = _manifest_path(index_dir) + ".tmp"
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, _manifest_path(index_dir))


def done_partitions(index_dir: str, stage: str) -> set[int]:
    m = load_manifest(index_dir)
    if m.empty:
        return set()
    sel = m[(m["stage"] == stage) & (m["status"] == "done")]
    return set(int(p) for p in sel["partition_id"])


def mark(index_dir: str, stage: str, partition_ids: list[int], status: str,
         rows_in: dict[int, int] | None = None,
         terms_out: dict[int, int] | None = None,
         started_at: datetime | None = None) -> None:
    """Upsert manifest rows for (stage, partition_ids)."""
    m = load_manifest(index_dir)
    now = datetime.now(timezone.utc)
    # one vectorized prior-attempt lookup for the whole id list — a
    # per-pid mask over the manifest is O(|ids| × |manifest|), which
    # at 2^18 staging buckets turns this upsert into hours of driver
    # time (measured: the post-staging hang of the first 2^18 build)
    prev = m[(m["stage"] == stage) & (m["partition_id"].isin(partition_ids))]
    prev_attempt = (
        {int(p): int(a) for p, a in
         prev.groupby("partition_id")["attempt"].max().items()}
        if len(prev) else {})
    new_rows = []
    for pid in partition_ids:
        pa = prev_attempt.get(int(pid))
        attempt = 1 if pa is None else (pa if status == "done" else pa + 1)
        new_rows.append({
            "partition_id": pid, "stage": stage, "status": status,
            "attempt": attempt,
            "rows_in": (rows_in or {}).get(pid, -1),
            "terms_out": (terms_out or {}).get(pid, -1),
            "started_at": started_at or now, "finished_at": now,
        })
    keep = m[~((m["stage"] == stage) & (m["partition_id"].isin(partition_ids)))]
    add = pd.DataFrame(new_rows)
    out = add if keep.empty else pd.concat([keep, add], ignore_index=True)
    os.makedirs(index_dir, exist_ok=True)
    _write_manifest(index_dir, out)


def record_metrics(index_dir: str, run_id: str, stage: str,
                   rows: list[tuple[int, str, float]]) -> None:
    """Append (partition_id, metric, value) rows for one stage."""
    path = _metrics_path(index_dir)
    new = pd.DataFrame(
        [{"run_id": run_id, "stage": stage, "partition_id": pid,
          "metric": metric, "value": float(value), "ts": time.time()}
         for pid, metric, value in rows]
    )
    if os.path.exists(path):
        new = pd.concat([pd.read_parquet(path), new], ignore_index=True)
    tmp = path + ".tmp"
    new.to_parquet(tmp, index=False)
    os.replace(tmp, path)


def load_metrics(index_dir: str) -> pd.DataFrame:
    path = _metrics_path(index_dir)
    if os.path.exists(path):
        return pd.read_parquet(path)
    return pd.DataFrame(columns=["run_id", "stage", "partition_id",
                                 "metric", "value", "ts"])

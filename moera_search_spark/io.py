"""Transcripts source adapter — Iceberg table or parquet directory.

The input contract (BASELINE.json ``input_hint``) is an Iceberg table
of transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.  This
sandbox has no Iceberg runtime jars, so the adapter resolves in order:

1. an explicit ``format`` argument;
2. a catalog table name (contains no ``/`` → ``spark.table``; Iceberg
   tables registered in the session catalog resolve here, metadata
   pruning and all);
3. ``format("iceberg").load(path)`` when the Iceberg Spark runtime is
   on the classpath (probed once per session);
4. plain parquet directory (this sandbox's testdata layout).

Everything downstream (build, incremental, streaming) is
source-agnostic: it sees a DataFrame in the transcripts schema.  The
reference's equivalent surface is its repository layer, which hides
Neo4j behind typed queries (reference: data/EntryRepository.java,
scanner/updates/TimelineScanJob.java:114-186 pages the feed the same
rows come from here in one scan).
"""

from __future__ import annotations

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _iceberg_available(spark) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_transcripts(spark, source: str, *, fmt: str | None = None):
    """Load the transcripts input as a DataFrame (see module docstring
    for resolution order)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(source)
    if fmt == "parquet":
        return spark.read.parquet(source)
    if fmt is not None:
        return spark.read.format(fmt).load(source)
    if "/" not in source:
        return spark.table(source)
    if _iceberg_available(spark) and not source.endswith(".parquet"):
        try:
            return spark.read.format("iceberg").load(source)
        except Exception:
            pass
    return spark.read.parquet(source)

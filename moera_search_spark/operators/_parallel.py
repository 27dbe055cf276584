"""Small-input parallelization for CPU-heavy document pipelines.

A test-scale `documents.parquet` is one small file, so the parquet
scan yields ONE input split and every downstream row-local expression
(tokenization, shingling, per-element md5, minhash folds, binary
decode) runs on a single core of the whole session — measured 4.5 s
single-threaded for a 600 KB file at sf0.1 whose work parallelizes to
~0.4 s on 16 cores.  At the 100-TB design point the scan has
thousands of splits (maxPartitionBytes-sized) and this helper is a
no-op; it only fires when the scan is narrower than the session's
parallelism, and it hash-partitions on a key column so the exchange
is deterministic.
"""

from __future__ import annotations


def ensure_parallelism(df, key: str = "doc_id"):
    """Repartition ``df`` by ``key`` up to the session's default
    parallelism iff the current plan has fewer partitions — one tiny
    bounded exchange at test scale, a no-op at data scale."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df

"""Operator inventory (SURVEY.md §2) re-expressed Spark-first.

Each module exports ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent ANSI SQL DuckDB runs on the same parquet tables.  Column
names and types are aligned between both sides; computed floats are
emitted as integer micro-units (``*_e6`` bigint) so cross-engine float
summation order can never flip a value hash.
"""

from __future__ import annotations


def merged_queries() -> dict:
    from . import (
        dedup,
        engine_serving,
        fulltext,
        incremental_ops,
        multimodal,
        relational,
        scalar_funcs,
        similarity,
        sinks,
        text_analysis,
    )

    out: dict = {}
    # ≤ 50 entries total so the driver's correctness window checks
    # EVERY catalog row (round 1 registered 58 and the last 8 were
    # never driver-verified); registration order is flagship-first.
    for mod in (fulltext, engine_serving, incremental_ops, sinks,
                text_analysis, multimodal, dedup, similarity,
                scalar_funcs, relational):
        for name, pair in mod.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = pair
    return out

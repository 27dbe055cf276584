"""Deterministic synthetic transcripts corpus + reference query set.

The engine's input contract (BASELINE.json ``input_hint``) is an
Iceberg table of multi-turn conversation/agent transcripts:

    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)

A document is one ``(conv_id, turn_idx)`` turn — exactly as the
reference's document is one ``(nodeName, postingId[, commentId])``
entry (reference: index/IndexedDocument.java:20-23,44-66).

Everything here is derived from seeded RNGs keyed by conversation
index, so the corpus is identical regardless of Spark partitioning and
regenerable at any scale without storing data.  The vocabulary is
Zipf-distributed so head terms land in >30% of documents — this is
what exercises head-term skew / salting in the build.  Edge-case texts
(possessives, HTML fragments, hashtags, unicode, stopword-only, empty)
mirror the reference's text-handling surface (clearHtml
util/Util.java:77-82; hashtag regex util/BodyUtil.java:18-20).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "search", "browser"]
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

# ~120 real-ish stems + generated tail → Zipf sampling over ranks.
_HEAD_WORDS = (
    "the system runs a query over the index and returns results "
    "spark data table join scan filter sort merge shuffle partition "
    "build search term document score rank page node graph text token "
    "stream batch window count sum value key hash block list code file "
    "test run job task queue time user tool agent turn reply answer "
    "question error retry cache disk memory network plan cost row "
    "column type schema write read commit state log event message"
).split()


def _vocab(size: int = 2000) -> list[str]:
    words = list(dict.fromkeys(_HEAD_WORDS))
    words += [f"term{i:04d}" for i in range(size - len(words))]
    return words


_VOCAB = _vocab()
_EDGE_TEXTS = [
    "",                                     # empty
    "!!! ... ???",                          # punctuation-only
    "the and of to in",                     # stopword-only
    "the world's biggest running system",   # possessive + stems
    "<b>bold</b> &amp; <i>italic</i> markup fragment",  # HTML-ish
    "#spark_fts is trending alongside #block_max tags",  # hashtags
    "привет мир unicode текст 😀 emoji",     # unicode
    "running runs ran runner runnable",     # stem variants
]

TRANSCRIPTS_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _conv_rows(conv_index: int, seed: int) -> list[tuple]:
    """All turns of one conversation, derived only from (conv_index, seed)."""
    rng = np.random.default_rng((seed, conv_index))
    conv_id = f"conv-{conv_index:08d}"
    # Zipf-ish number of turns per conversation, 1..64.
    n_turns = int(min(64, 1 + rng.zipf(1.6)))
    rows = []
    for turn_idx in range(n_turns):
        role = ROLES[int(rng.integers(0, len(ROLES)))]
        tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else None
        edge_draw = rng.random()
        if edge_draw < 0.04:
            text = _EDGE_TEXTS[int(rng.integers(0, len(_EDGE_TEXTS)))]
        else:
            n_words = int(min(250, rng.zipf(1.35)))
            ranks = np.minimum(rng.zipf(1.25, size=n_words), len(_VOCAB)) - 1
            text = " ".join(_VOCAB[r] for r in ranks)
        ts = BASE_TS + timedelta(seconds=conv_index * 60 + turn_idx * 7)
        rows.append((conv_id, turn_idx, role, text, tool, ts))
    return rows


def gen_transcripts_pdf(n_convs: int, seed: int = 42) -> pd.DataFrame:
    """Local pandas generator (tests, oracle input)."""
    rows = [r for ci in range(n_convs) for r in _conv_rows(ci, seed)]
    pdf = pd.DataFrame(rows, columns=TRANSCRIPTS_COLUMNS)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def transcripts_schema():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ])


def transcripts_df(spark, n_convs: int, seed: int = 42,
                   parallelism: int | None = None):
    """Distributed generator: spark.range(n_convs) → mapInPandas.

    Each conversation is derived purely from its index, so the result
    is deterministic and partition-invariant — generation scales to
    bench sizes without the driver materializing anything.
    """
    if parallelism is None:
        parallelism = spark.sparkContext.defaultParallelism
    schema = transcripts_schema()

    def gen(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = [r for ci in pdf["id"].values
                    for r in _conv_rows(int(ci), seed)]
            out = pd.DataFrame(rows, columns=TRANSCRIPTS_COLUMNS)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return (
        spark.range(0, n_convs, numPartitions=parallelism)
        .mapInPandas(gen, schema=schema)
    )


def reference_query_set() -> list[dict]:
    """Fixed reference query set (FIXTURES.md §2).

    Covers: single rare term, single head term, multi-term, absent
    term, stopword-only, possessive/stem-variant forms, and unscored
    filter combinations mirroring Index.search's optional filters
    (reference: index/Index.java:298-385).
    """
    return [
        {"query_id": "q_rare", "query_text": "term1847", "filters": None, "k": 10},
        {"query_id": "q_head", "query_text": "the system", "filters": None, "k": 10},
        {"query_id": "q_multi", "query_text": "spark shuffle partition", "filters": None, "k": 10},
        {"query_id": "q_absent", "query_text": "zzzzunknownterm", "filters": None, "k": 10},
        {"query_id": "q_stop", "query_text": "the and of", "filters": None, "k": 10},
        {"query_id": "q_possessive", "query_text": "world's running", "filters": None, "k": 10},
        {"query_id": "q_stems", "query_text": "runs", "filters": None, "k": 10},
        {"query_id": "q_role_filter", "query_text": "query index",
         "filters": {"role": "assistant"}, "k": 10},
        {"query_id": "q_tool_filter", "query_text": "search results",
         "filters": {"tool": "bash"}, "k": 10},
        {"query_id": "q_ts_filter", "query_text": "data table join",
         "filters": {"ts_min": BASE_TS + timedelta(hours=1),
                     "ts_max": BASE_TS + timedelta(hours=200)}, "k": 10},
        {"query_id": "q_combo_filter", "query_text": "error retry cache",
         "filters": {"role": "tool", "tool": "search"}, "k": 10},
    ]


def filters_predicate(filters: dict | None):
    """Oracle-side predicate equivalent of the unscored filter clauses."""
    if not filters:
        return None

    def pred(attrs: dict) -> bool:
        if "role" in filters and attrs.get("role") != filters["role"]:
            return False
        if "tool" in filters and attrs.get("tool") != filters["tool"]:
            return False
        ts = attrs.get("ts")
        if "ts_min" in filters and not (ts is not None and ts >= filters["ts_min"]):
            return False
        if "ts_max" in filters and not (ts is not None and ts <= filters["ts_max"]):
            return False
        return True

    return pred

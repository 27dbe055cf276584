"""Pure-python oracle for the winnowing fingerprint column of
text_doc_profile (the rolling-hash local fingerprint; the rest of the
profile is hash-verified by the driver's DuckDB gate)."""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from moera_search_spark.operators.text_analysis import (
    WINNOW_K,
    WINNOW_W,
    text_doc_profile,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_winnow(text: str) -> str | None:
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    n_grams = len(norm) - (WINNOW_K - 1)
    if n_grams < WINNOW_W:
        return None
    hs = [int(hashlib.md5(norm[i:i + WINNOW_K].encode())
              .hexdigest()[:12], 16) for i in range(n_grams)]
    kept = sorted({min(hs[j:j + WINNOW_W])
                   for j in range(n_grams - WINNOW_W + 1)})
    return hashlib.md5(",".join(str(h) for h in kept).encode()).hexdigest()


def test_winnow_matches_python_oracle(spark):
    got = {int(r["doc_id"]): r["fp_winnow"] for r in
           text_doc_profile(spark, SF_DIR).collect()}
    pdf = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
           .select("doc_id", "text").toPandas().head(30))
    for _, row in pdf.iterrows():
        assert got[int(row["doc_id"])] == _py_winnow(row["text"])


def test_winnow_edge_cases(spark, tmp_path):
    """Short docs (< k+w-1 usable grams) yield NULL, not a bogus
    digest; two docs sharing a long run share kept hashes (checked on
    the digest of a doc fully contained in another only when the
    containment covers the whole kept set — here via exact-equality
    of duplicated text modulo whitespace)."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["tiny",                       # < k chars
                 "exactly8!",                  # k ≤ chars < k+w-1
                 "the quick brown fox jumps over the lazy dog",
                 "THE  quick   brown fox jumps over the lazy dog  ",
                 ""],
        "lang": ["en"] * 5,
        "source": ["s"] * 5,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = {int(r["doc_id"]): r["fp_winnow"] for r in
           text_doc_profile(spark, str(tmp_path)).collect()}
    assert got[1] is None and got[2] is None and got[5] is None
    assert got[3] is not None
    # same normalized text → same winnowing fingerprint
    assert got[3] == got[4] == _py_winnow(docs.loc[2, "text"])


@pytest.mark.parametrize("n", [WINNOW_K + WINNOW_W - 1])
def test_winnow_minimum_length_boundary(spark, tmp_path, n):
    """The shortest text with a fingerprint is k+w-1 chars (exactly
    one window)."""
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a" * (n - 1), "a" * n],
        "lang": ["en"] * 2,
        "source": ["s"] * 2,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = {int(r["doc_id"]): r["fp_winnow"] for r in
           text_doc_profile(spark, str(tmp_path)).collect()}
    assert got[1] is None
    assert got[2] == _py_winnow("a" * n)

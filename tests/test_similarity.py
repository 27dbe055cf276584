"""Python oracle for the IVF ANN path (no SQL oracle possible —
k-means training isn't SQL): reproduce centroids, cell assignment,
probe selection, and the final top-k exactly in numpy."""

from __future__ import annotations

import numpy as np
import pytest

from moera_search_spark.operators.similarity import (
    K,
    KMEANS_ITERS,
    N_CENTROIDS,
    N_PROBE,
    QUERY_VEC_ID,
    SAMPLE_EVERY,
    SAMPLE_MAX,
    ann_ivf_topk,
    ivf_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_pdf(spark):
    return (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .orderBy("vec_id").toPandas())


def _py_centroids(emb_pdf):
    sample = emb_pdf[emb_pdf["vec_id"] % SAMPLE_EVERY == 0] \
        .head(SAMPLE_MAX)
    X = np.stack(sample["embedding"].values).astype(np.float64)
    C = X[:N_CENTROIDS].copy()
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    for _ in range(KMEANS_ITERS):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True),
                            1e-12)
        assign = (Xn @ Cn.T).argmax(axis=1)
        for j in range(N_CENTROIDS):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


class TestIVF:
    def test_centroids_deterministic(self, spark, emb_pdf):
        got = ivf_centroids(spark, SF_DIR)
        exp = _py_centroids(emb_pdf)
        assert np.allclose(got, exp, atol=1e-12)

    def test_topk_matches_python_oracle(self, spark, emb_pdf):
        C = _py_centroids(emb_pdf)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True),
                            1e-12)
        X = np.stack(emb_pdf["embedding"].values).astype(np.float64)
        ids = emb_pdf["vec_id"].values
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                            1e-12)
        cells = (Xn @ Cn.T).argmax(axis=1)
        qi = int(np.where(ids == QUERY_VEC_ID)[0][0])
        probes = set((Xn[qi] @ Cn.T).argsort()[::-1][:N_PROBE].tolist())
        cand = [(int(i), int(c)) for i, c in zip(ids, cells)
                if c in probes and i != QUERY_VEC_ID]
        scored = []
        for vec_id, cell in cand:
            j = int(np.where(ids == vec_id)[0][0])
            cos = float(Xn[j] @ Xn[qi])
            scored.append((vec_id, cell, int(round(cos * 1e4))))
        scored.sort(key=lambda t: (-t[2], t[0]))
        exp = scored[:K]
        got = [(int(r["vec_id"]), int(r["cell"]), int(r["cos_e4"]))
               for r in ann_ivf_topk(spark, SF_DIR).collect()]
        assert got == exp

    def test_ivf_recall_vs_brute_force(self, spark):
        """Not a correctness gate (IVF is approximate) — asserts the
        probe covers the query's own cell, so the top result of the
        brute-force scan inside that cell is found."""
        got = {int(r["vec_id"]) for r in
               ann_ivf_topk(spark, SF_DIR).collect()}
        assert len(got) == K


class TestBucketHistogram:
    def test_histogram_matches_duckdb_oracle(self, spark):
        """ann_bucket_histogram left the driver catalog (50-entry
        window) but keeps full cross-engine verification here."""
        import duckdb

        from moera_search_spark.operators.similarity import (
            ANN_BUCKET_HISTOGRAM_SQL,
            ann_bucket_histogram,
        )

        got = {int(r["bucket"]): int(r["n_vecs"])
               for r in ann_bucket_histogram(spark, SF_DIR).collect()}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{SF_DIR}/embeddings.parquet'")
        want = {int(b): int(n) for b, n in
                con.execute(ANN_BUCKET_HISTOGRAM_SQL).fetchall()}
        assert got == want and got

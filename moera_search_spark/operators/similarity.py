"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (bucket first, score within bucket — the
same prune-then-score shape as the engine's block-max WAND).  Both are
pure DataFrame algebra: the dot product is ``zip_with`` +
``aggregate`` (JVM-side higher-order functions, no python UDF).
"""

from __future__ import annotations

QUERY_VEC_ID = 0
K = 10
LSH_BITS = 8


def _emb(spark, sf_dir):
    from ._parallel import ensure_parallelism

    return ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), key="vec_id")


def _with_norm(df):
    from pyspark.sql import functions as F

    return df.withColumn(
        "nrm",
        F.sqrt(F.aggregate("embedding", F.lit(0.0),
                           lambda acc, x: acc + x.cast("double")
                           * x.cast("double"))))


def _cos(F):
    return F.aggregate(
        F.zip_with("a.embedding", "q.embedding",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x) \
        / (F.col("a.nrm") * F.col("q.nrm"))


def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k against the query vector (vec_id 0),
    deterministic (sim, vec_id) ordering.  The query side is one row —
    Catalyst broadcasts it; the scan side streams."""
    from pyspark.sql import functions as F

    e = _with_norm(_emb(spark, sf_dir))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).alias("q")
    a = e.filter(F.col("vec_id") != QUERY_VEC_ID).alias("a")
    return (
        a.crossJoin(F.broadcast(q))
        .withColumn("cos_e4", F.round(_cos(F) * 1e4).cast("long"))
        .select(F.col("a.vec_id").alias("vec_id"), "cos_e4")
        .orderBy(F.desc("cos_e4"), F.asc("vec_id"))
        .limit(K)
    )


ANN_COSINE_TOPK_SQL = f"""
    WITH q AS (SELECT embedding FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID})
    SELECT a.vec_id,
           CAST(round(list_cosine_similarity(a.embedding, q.embedding)
                      * 1e4) AS BIGINT) AS cos_e4
    FROM embeddings a, q WHERE a.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_e4 DESC, a.vec_id LIMIT {K}
"""


def _bucket_expr(F):
    """Axis-sign LSH: bit i = sign(embedding[i]) for the first
    LSH_BITS dimensions — deterministic random-hyperplane LSH with
    basis-vector hyperplanes (no shared RNG needed across engines)."""
    b = F.lit(0)
    for i in range(LSH_BITS):
        b = b + F.when(F.element_at("embedding", i + 1) >= 0,
                       F.lit(1 << i)).otherwise(F.lit(0))
    return b


def ann_lsh_bucket_topk(spark, sf_dir):
    """LSH-bucketed ANN: score only vectors sharing the query's bucket.
    At scale this turns a full scan into a bucket-pruned scan
    (parquet layout partitioned by bucket would prune at the file
    level)."""
    from pyspark.sql import functions as F

    e = _with_norm(_emb(spark, sf_dir)).withColumn("bucket",
                                                   _bucket_expr(F))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).alias("q")
    a = e.filter(F.col("vec_id") != QUERY_VEC_ID).alias("a")
    return (
        a.crossJoin(F.broadcast(q))
        .filter(F.col("a.bucket") == F.col("q.bucket"))
        .withColumn("cos_e4", F.round(_cos(F) * 1e4).cast("long"))
        .select(F.col("a.vec_id").alias("vec_id"), "cos_e4")
        .orderBy(F.desc("cos_e4"), F.asc("vec_id"))
        .limit(K)
    )


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(LSH_BITS))

ANN_LSH_BUCKET_TOPK_SQL = f"""
    WITH b AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket
               FROM embeddings),
    q AS (SELECT embedding, bucket FROM b WHERE vec_id = {QUERY_VEC_ID})
    SELECT a.vec_id,
           CAST(round(list_cosine_similarity(a.embedding, q.embedding)
                      * 1e4) AS BIGINT) AS cos_e4
    FROM b a, q
    WHERE a.vec_id <> {QUERY_VEC_ID} AND a.bucket = q.bucket
    ORDER BY cos_e4 DESC, a.vec_id LIMIT {K}
"""


def ann_bucket_histogram(spark, sf_dir):
    """Bucket occupancy histogram — the IVF/LSH planning statistic
    (how selective is the prune)."""
    from pyspark.sql import functions as F

    e = _emb(spark, sf_dir).withColumn("bucket", _bucket_expr(F))
    return e.groupBy("bucket").agg(F.count("*").alias("n_vecs"))


ANN_BUCKET_HISTOGRAM_SQL = f"""
    SELECT {_BUCKET_SQL} AS bucket, count(*) AS n_vecs
    FROM embeddings GROUP BY 1
"""


N_CENTROIDS = 16
N_PROBE = 2
KMEANS_ITERS = 5
SAMPLE_EVERY = 7
SAMPLE_MAX = 512


def _ivf_kmeans(X):
    """The deterministic Lloyd core shared by the Spark path and the
    SQL-oracle generator: first-k init, KMEANS_ITERS iterations,
    cosine assignment, unnormalized mean update."""
    import numpy as np

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


def ivf_centroids(spark, sf_dir):
    """Deterministic coarse quantizer: spherical k-means over a fixed
    arithmetic sample (every 7th vec_id, ≤512 rows), first-k init,
    5 Lloyd iterations — no RNG, so the python test oracle reproduces
    the exact centroids.  At 10^9+ vectors the sample stays
    driver-sized (IVF training is always a sample problem)."""
    import numpy as np

    from pyspark.sql import functions as F

    rows = (_emb(spark, sf_dir)
            .filter(F.col("vec_id") % SAMPLE_EVERY == 0)
            .orderBy("vec_id").limit(SAMPLE_MAX)
            .select("embedding").collect())
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return _ivf_kmeans(X)


def _cell_udf(C):
    """Arrow-vectorized cell assignment: argmax cosine vs the (tiny,
    closure-broadcast) centroid matrix — numpy matmul per batch."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def assign(embs):
        X = np.stack(embs.values).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                            1e-12)
        return pd.Series((Xn @ Cn.T).argmax(axis=1).astype(np.int32))

    # real type hints (the module's postponed annotations would turn
    # inline hints into strings, which pandas_udf can't resolve)
    assign.__annotations__ = {"embs": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "int")


def ann_ivf_topk(spark, sf_dir):
    """IVF ANN: coarse-quantize every vector to its nearest centroid
    cell, probe the query's N_PROBE nearest cells, score only those
    candidates.  The inverted-file analogue of the engine's postings:
    at scale the table is laid out partitioned by cell, so a query
    reads N_PROBE partitions instead of the full scan."""
    import numpy as np

    from pyspark.sql import functions as F

    C = ivf_centroids(spark, sf_dir)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    e = _with_norm(_emb(spark, sf_dir)).withColumn(
        "cell", _cell_udf(C)("embedding"))
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    qv = np.array(q_row["embedding"], dtype=np.float64)
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    probes = [int(c) for c in (qn @ Cn.T).argsort()[::-1][:N_PROBE]]
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).alias("q")
    a = (e.filter(F.col("vec_id") != QUERY_VEC_ID)
         .filter(F.col("cell").isin(probes)).alias("a"))
    return (
        a.crossJoin(F.broadcast(q))
        .withColumn("cos_e4", F.round(_cos(F) * 1e4).cast("long"))
        .select(F.col("a.vec_id").alias("vec_id"),
                F.col("a.cell").cast("long").alias("cell"), "cos_e4")
        .orderBy(F.desc("cos_e4"), F.asc("vec_id"))
        .limit(K)
    )


def _ann_ivf_sql(sf_dir: str) -> str | None:
    """DuckDB twin of ann_ivf_topk (VERDICT round 2 item 3).

    The centroids and probe cells are deterministic driver-side values
    (fixed arithmetic sample + RNG-free Lloyd, ``_ivf_kmeans``), so
    the oracle reproduces them HERE in pure pandas/numpy from the
    same parquet and inlines the normalized centroids as DOUBLE[]
    literals (``repr`` → shortest round-trip decimals, parsed back to
    the identical float64).  Cell assignment is then the same argmax
    the Arrow UDF computes, expressed as a rank over per-centroid dot
    products (ties → lowest cell, matching ``np.argmax``); the final
    scoring reuses ``list_cosine_similarity`` like the other ANN
    oracles.  An ``oracle_sql()`` string is bound to ONE dataset, so
    the generator reads the gate's sf dir (``SPARK_GRAFT_ORACLE_SF_DIR``
    env override, default the driver's sf0.01); unreadable data →
    None → the driver falls back to the rows-only check."""
    import numpy as np
    import pandas as pd

    try:
        pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
    except Exception:
        return None
    sample = (pdf[pdf["vec_id"] % SAMPLE_EVERY == 0]
              .sort_values("vec_id").head(SAMPLE_MAX))
    X = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    C = _ivf_kmeans(X)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    qv = np.asarray(
        pdf.loc[pdf["vec_id"] == QUERY_VEC_ID, "embedding"].iloc[0],
        dtype=np.float64)
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    probes = [int(c) for c in (qn @ Cn.T).argsort()[::-1][:N_PROBE]]
    cent_rows = ",\n             ".join(
        "({j}, [{v}]::DOUBLE[])".format(
            j=j, v=", ".join(repr(float(x)) for x in Cn[j]))
        for j in range(N_CENTROIDS))
    return f"""
    WITH cents AS (
      SELECT * FROM (VALUES
             {cent_rows}
      ) AS t(cell, cvec)),
    scores AS (
      SELECT e.vec_id, e.embedding, c.cell,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
               AS dot
      FROM embeddings e CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT vec_id, embedding, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dot DESC, cell ASC) AS rn
        FROM scores) WHERE rn = 1),
    q AS (SELECT embedding FROM embeddings
          WHERE vec_id = {QUERY_VEC_ID})
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
           CAST(round(list_cosine_similarity(a.embedding, q.embedding)
                      * 1e4) AS BIGINT) AS cos_e4
    FROM assign a, q
    WHERE a.vec_id <> {QUERY_VEC_ID}
      AND a.cell IN ({", ".join(str(p) for p in probes)})
    ORDER BY cos_e4 DESC, a.vec_id LIMIT {K}
"""


import os as _os  # noqa: E402

ANN_IVF_TOPK_SQL = _ann_ivf_sql(
    _os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"))


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_COSINE_TOPK_SQL),
    "ann_lsh_bucket_topk": (ann_lsh_bucket_topk, ANN_LSH_BUCKET_TOPK_SQL),
    # full SQL oracle since round 3 (inlined deterministic centroids);
    # the python recall/centroid oracle in tests stays
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_TOPK_SQL),
    # ann_bucket_histogram stays as a helper (prune-selectivity
    # diagnostic, oracle-checked in tests) but is not a catalog row —
    # keeps the catalog inside the driver's checked window.
}

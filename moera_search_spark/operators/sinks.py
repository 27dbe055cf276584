"""Sink/point-access operator parity (SURVEY.md §2.1).

* ``sink_update_by_query`` — the Painless-script bulk patch: set a
  field on every doc matching a key set, expressed as join + coalesce
  (reference: Index.updatePublishersByPostingId, index/Index.java:160-189
  — update-by-query with script over all docs with a postingId).
* ``source_point_get`` — point get with field projection
  (reference: Index.get / Index.getRevision with ``sourceIncludes``,
  index/Index.java:242-273): predicate + column pruning reach the scan.
"""

from __future__ import annotations


def sink_update_by_query(spark, sf_dir):
    """Patch lang on the 5 longest src1 documents via a derived patch
    table joined back (the MERGE-shaped update path)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    patch = (docs.filter(F.col("source") == "src1")
             .orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(5)
             .select("doc_id", F.lit("patched").alias("new_lang")))
    return (docs.join(F.broadcast(patch), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("new_lang", "lang").alias("lang"))
            .filter(F.col("lang") == "patched"))


SINK_UPDATE_BY_QUERY_SQL = """
    WITH patch AS (
      SELECT doc_id, 'patched' AS new_lang FROM documents
      WHERE source = 'src1'
      ORDER BY n_chars DESC, doc_id LIMIT 5)
    SELECT d.doc_id, coalesce(patch.new_lang, d.lang) AS lang
    FROM documents d LEFT JOIN patch USING (doc_id)
    WHERE coalesce(patch.new_lang, d.lang) = 'patched'
"""


def source_point_get(spark, sf_dir):
    """Point get by id with projected fields (sourceIncludes)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.filter(F.col("doc_id") == 123)
            .select("doc_id", "lang", "source"))


SOURCE_POINT_GET_SQL = """
    SELECT doc_id, lang, source FROM documents WHERE doc_id = 123
"""


QUERIES = {
    "sink_update_by_query": (sink_update_by_query,
                             SINK_UPDATE_BY_QUERY_SQL),
    "source_point_get": (source_point_get, SOURCE_POINT_GET_SQL),
}

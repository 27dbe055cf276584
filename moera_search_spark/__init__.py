"""moera_search_spark — a PySpark-native full-text index + BM25 query engine.

A brand-new engine (not a port) with the indexing and retrieval
capabilities of MoeraOrg/moera-search: the reference delegates analysis
and scoring to OpenSearch/Lucene (reference: index/Index.java,
doc/mappings.txt) and graph queries to Neo4j; here every capability is
re-expressed as PySpark DataFrame plans plus vectorized Arrow UDFs.

Modules
-------
analyzer      Lucene-``english``-equivalent analysis chain (tokenize →
              possessive strip → lowercase → stopwords → Porter stem)
porter        Porter stemmer (pure python, memoized, Arrow-batch applied)
fixtures      deterministic synthetic transcripts + reference query set
oracle        pure-python BM25 oracle (the stand-in for the reference's
              Lucene top-k; the rank-identity contract)
build         resumable distributed index build (docs / stats / postings)
postings      delta+varbyte posting codec with per-block max metadata
query         top-k BM25 retrieval (DataFrame path + block-max WAND path)
manifest      per-partition build lineage + metrics tables
io_adapter    Iceberg-or-parquet table adapter
operators.*   the wider operator inventory from SURVEY.md §2
"""

__version__ = "0.1.0"

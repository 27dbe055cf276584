"""Full-text / BM25 operators over the ``documents`` table — the
SQL-parity twin of the engine's index+query path.

These use the ``simple`` analyzer (lowercase + split on non-alnum —
the analyzer of the reference's node-name fulltext index, reference:
src/main/resources/db/migration/V5__moera_node_simple_fulltext.cypher:2-8)
so the DuckDB oracle can reproduce tokenization exactly in ANSI SQL.
The engine-grade path (Lucene-english chain, compressed postings,
block-max pruning) lives in build.py/query.py and is verified by
pytest against the pure-python oracle; these entries verify the same
*scoring semantics* cross-engine:

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))          (Lucene BM25)
    tfnorm = tf / (tf + k1(1 - b + b·dl/avgdl))       k1=1.2 b=0.75

as invoked by the reference's search entry point (reference:
index/Index.java:278-410; pagination from/size at :397-398).

All Spark plans here are pure DataFrame algebra (split/explode/agg/
join) — whole-stage-codegen'd, no python in the hot path.
"""

from __future__ import annotations

QUERY_TERMS = ["spark", "join", "window"]  # fixed reference query
DICT_TERMS = ["spark", "join", "window", "table", "row", "scan"]
K = 10

_TOKS_SQL = """
    SELECT doc_id, term FROM (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
      FROM documents
    ) WHERE term <> ''
"""


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(spark, sf_dir):
    from pyspark.sql import functions as F

    return (
        _docs(spark, sf_dir)
        .select("doc_id",
                F.explode(F.split(F.lower("text"), "[^a-z0-9]+"))
                .alias("term"))
        .filter(F.col("term") != "")
    )


def fts_corpus_stats(spark, sf_dir):
    """N and avgdl — the corpus statistics Lucene maintains per segment."""
    from pyspark.sql import functions as F

    dl = _toks(spark, sf_dir).groupBy("doc_id").agg(
        F.count("*").alias("dl"))
    return dl.agg(
        F.count("*").alias("n_docs"),
        (F.round(F.avg("dl") * 1e6)).cast("long").alias("avgdl_e6"))


FTS_CORPUS_STATS_SQL = f"""
    WITH toks AS ({_TOKS_SQL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)
    SELECT count(*) AS n_docs,
           CAST(round(avg(dl) * 1e6) AS BIGINT) AS avgdl_e6
    FROM dl
"""


def fts_term_stats(spark, sf_dir):
    """df per dictionary term (term_stats analogue)."""
    from pyspark.sql import functions as F

    return (
        _toks(spark, sf_dir)
        .filter(F.col("term").isin(DICT_TERMS))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )


FTS_TERM_STATS_SQL = f"""
    WITH toks AS ({_TOKS_SQL})
    SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM toks WHERE term IN ({", ".join(repr(t) for t in DICT_TERMS)})
    GROUP BY term
"""


def fts_doc_lengths(spark, sf_dir):
    """dl per document (the norms sidecar).  No longer a catalog row:
    it is a strict sub-plan of ``fts_corpus_stats`` (its dl CTE) and
    the engine's own doc lengths are pytest-verified; the slot went to
    ``fts_search_conversations`` (VERDICT round 2 item 8)."""
    from pyspark.sql import functions as F

    return _toks(spark, sf_dir).groupBy("doc_id").agg(
        F.count("*").alias("dl"))


FTS_DOC_LENGTHS_SQL = f"""
    WITH toks AS ({_TOKS_SQL})
    SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
"""


def fts_search_conversations(spark, sf_dir):
    """Conversation-level top-k: per-turn BM25 scores (the exact
    ``fts_bm25_topk`` scoring plan) rolled up per conversation with
    best-turn (max) semantics + matched-turn count — the SQL-parity
    twin of the engine's ``FTSIndex.search_conversations``
    (query.py) and the analogue of the reference folding comments
    into their parent posting via the ALL entry type
    (reference: EntryRepository.java:172-181).  ``source`` stands in
    for conv_id on the documents table.  The rollup aggregates the
    already-e6-rounded per-doc scores, so max() is integer-exact
    cross-engine."""
    from pyspark.sql import functions as F

    scored = _bm25_scored(spark, sf_dir, QUERY_TERMS)
    d = _docs(spark, sf_dir).select("doc_id", "source")
    per_conv = (scored.join(d, "doc_id")
                .groupBy("source")
                .agg(F.max("score_e6").alias("score_e6"),
                     F.count("*").alias("n_turns")))
    return (per_conv.orderBy(F.desc("score_e6"), F.asc("source"))
            .limit(K))


def _search_conversations_sql():
    terms = ", ".join(repr(t) for t in QUERY_TERMS)
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ({terms}) GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(sum(
               ln(1 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf / (tf.tf + 1.2 * (1 - 0.75
                                         + 0.75 * dl.dl / corpus.avgdl))
             ) * 1e6) AS BIGINT) AS score_e6
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), corpus
      GROUP BY tf.doc_id)
    SELECT d.source, max(score_e6) AS score_e6,
           count(*) AS n_turns
    FROM scored JOIN documents d ON d.doc_id = scored.doc_id
    GROUP BY d.source
    ORDER BY score_e6 DESC, d.source LIMIT {K}
"""


FTS_SEARCH_CONVERSATIONS_SQL = _search_conversations_sql()


def _bm25_scored(spark, sf_dir, q_terms):
    """Shared BM25 scoring plan: tf ⋈ df ⋈ dl ⋈ corpus → per-doc score.

    The query-term ⋈ postings join of the search path (reference:
    Index.java:304-313, executed by Lucene) — here terms_df ⋈ tf rows
    with the per-term idf broadcast by Catalyst (tiny dimension side).
    """
    from pyspark.sql import functions as F

    toks = _toks(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    qt = toks.filter(F.col("term").isin(q_terms))
    tf = qt.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "contrib",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5))
            * F.col("tf")
            / (F.col("tf") + 1.2 * (1.0 - 0.75
                                    + 0.75 * F.col("dl") / F.col("avgdl"))))
    )
    return contrib.groupBy("doc_id").agg(
        (F.round(F.sum("contrib") * 1e6)).cast("long").alias("score_e6"))


def _bm25_sql(q_terms, extra_filter=""):
    terms = ", ".join(repr(t) for t in q_terms)
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ({terms}) GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(sum(
               ln(1 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf / (tf.tf + 1.2 * (1 - 0.75
                                         + 0.75 * dl.dl / corpus.avgdl))
             ) * 1e6) AS BIGINT) AS score_e6
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), corpus
      GROUP BY tf.doc_id)
    SELECT scored.doc_id, score_e6 FROM scored
    JOIN documents ON documents.doc_id = scored.doc_id
    {extra_filter}
    ORDER BY score_e6 DESC, scored.doc_id LIMIT {K}
"""


def fts_bm25_topk(spark, sf_dir):
    """Top-k BM25, deterministic (score, doc_id) tie-break — the
    by-text search path (SearchEntriesController.byText →
    Index.search)."""
    from pyspark.sql import functions as F

    scored = _bm25_scored(spark, sf_dir, QUERY_TERMS)
    return scored.orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(K)


FTS_BM25_TOPK_SQL = _bm25_sql(QUERY_TERMS)


def fts_bm25_filtered(spark, sf_dir):
    """BM25 + unscored filter (must vs filter separation,
    Index.java:296-313): filters restrict candidates but never change
    scores — corpus stats stay global."""
    from pyspark.sql import functions as F

    scored = _bm25_scored(spark, sf_dir, QUERY_TERMS)
    docs = _docs(spark, sf_dir).filter(F.col("lang") == "en") \
        .select("doc_id")
    return (scored.join(docs, "doc_id", "left_semi")
            .orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(K))


FTS_BM25_FILTERED_SQL = _bm25_sql(QUERY_TERMS,
                                  extra_filter="WHERE documents.lang = 'en'")


def fts_conjunctive_and(spark, sf_dir):
    """Conjunctive match: docs containing ALL query terms — posting
    intersection as a join on doc_id (SURVEY §2.3: posting-list
    intersection = join on docid)."""
    from pyspark.sql import functions as F

    toks = _toks(spark, sf_dir)
    hits = (toks.filter(F.col("term").isin(QUERY_TERMS)).distinct()
            .groupBy("doc_id").agg(F.count("*").alias("n_terms"))
            .filter(F.col("n_terms") == len(QUERY_TERMS)))
    return hits.select("doc_id")


FTS_CONJUNCTIVE_AND_SQL = f"""
    WITH toks AS ({_TOKS_SQL})
    SELECT doc_id FROM (
      SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
      WHERE term IN ({", ".join(repr(t) for t in QUERY_TERMS)})
      GROUP BY doc_id)
    WHERE n_terms = {len(QUERY_TERMS)}
"""


PREFIXES = ["sc", "jo"]   # the `sc* AND jo*` reference query shape


def fts_prefix_and(spark, sf_dir):
    """Multi-term prefix query — the reference's fulltext prefix
    search builds one wildcard per query word and ANDs them
    (``sc* AND jo*``, reference: NodeSearchRepository.java:296-299).

    Spark shape: each prefix scans the dictionary (a LIKE 'p%' range
    predicate the parquet term sort turns into row-group pruning at
    index scale), yielding a per-prefix doc set; the AND is a chain of
    left-semi joins (posting-intersection as join on doc_id, never a
    cross product).  Emits the per-doc count of distinct matching
    dictionary terms for the winning docs."""
    from pyspark.sql import functions as F

    toks = _toks(spark, sf_dir)
    hits = None
    for p in PREFIXES:
        dset = (toks.filter(F.col("term").startswith(p))
                .select("doc_id").distinct())
        hits = dset if hits is None else \
            hits.join(dset, "doc_id", "left_semi")
    pred = F.col("term").startswith(PREFIXES[0])
    for p in PREFIXES[1:]:
        pred = pred | F.col("term").startswith(p)
    return (toks.filter(pred).join(hits, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n_prefix_terms")))


FTS_PREFIX_AND_SQL = f"""
    WITH toks AS ({_TOKS_SQL}),
    hits AS (
      SELECT doc_id FROM toks WHERE term LIKE '{PREFIXES[0]}%'
      INTERSECT
      SELECT doc_id FROM toks WHERE term LIKE '{PREFIXES[1]}%')
    SELECT doc_id,
           CAST(count(DISTINCT term) AS BIGINT) AS n_prefix_terms
    FROM toks
    WHERE doc_id IN (SELECT doc_id FROM hits)
      AND (term LIKE '{PREFIXES[0]}%' OR term LIKE '{PREFIXES[1]}%')
    GROUP BY doc_id
"""


def fts_by_hashtag_keyset(spark, sf_dir):
    """The by-hashtag entry point: hashtag membership + keyset
    ("moment") pagination — `moment <= before ORDER BY moment DESC
    LIMIT n` (reference: EntryRepository.findEntriesByHashtag,
    EntryRepository.java:60-207; the entry-[:MARKED_WITH]->hashtag
    match at :79-93; slice bookkeeping
    SearchEntriesController.java:77-79,104-118).

    The MARKED_WITH existential is expressed in the reference's own
    shape: hashtags are extracted into an ARRAY column and the tag
    predicate is ``array_contains`` membership against it (the
    array-membership semi-join), not a text regex.  Documents get a
    synthetic leading ``#<source>`` tag so the extraction has matches;
    the moment key here is doc_id."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = 400
    tagged = F.concat(F.lit("#"), F.col("source"), F.lit(" "),
                      F.col("text"))
    tags = F.regexp_extract_all(tagged, F.lit(r"#[a-z0-9_]+"), 0)
    return (docs
            .withColumn("tags", tags)
            .filter(F.array_contains("tags", "#src1"))
            .filter(F.col("doc_id") <= before)
            .orderBy(F.desc("doc_id"))
            .limit(20)
            .select("doc_id", "lang"))


FTS_BY_HASHTAG_KEYSET_SQL = """
    SELECT doc_id, lang FROM documents
    WHERE list_contains(regexp_extract_all('#' || source || ' ' || text,
                                           '#[a-z0-9_]+'), '#src1')
      AND doc_id <= 400
    ORDER BY doc_id DESC LIMIT 20
"""


def fts_bm25_lang_routed(spark, sf_dir):
    """Query-language field routing (reference:
    index/LanguageAnalyzer.java:21-48 detects the query language and
    searches that language's twin fields; doc/mappings.txt:45-56
    declares the english+russian analyzer twins on every text field).

    SQL-parity restatement: documents are partitioned into per-language
    *fields* by their ``lang`` metadata; each field is analyzed with its
    own stop set (the twin-analyzer divergence, here the Lucene English
    stop set for the 'en' field); the query's language is detected
    driver-side (``analyzer.detect_language``, Cyrillic-script signal)
    and BM25 runs against ONLY the routed field with field-local
    corpus statistics (N, df, dl, avgdl) — exactly Lucene's per-field
    stats under multi-fields.  The engine-grade path (full Snowball
    russian chain + ``bilingual`` twin-term index) lives in
    analyzer.py/russian.py/query.py and is verified by pytest RU/EN
    goldens + rank-identity; this entry cross-checks the routing and
    field-local-stats semantics against DuckDB."""
    from pyspark.sql import functions as F

    from ..analyzer import ENGLISH_STOPWORDS, detect_language

    qlang = detect_language(" ".join(QUERY_TERMS))   # → 'en'
    stops = sorted(ENGLISH_STOPWORDS)
    field_toks = (
        _docs(spark, sf_dir)
        .filter(F.col("lang") == qlang)
        .select("doc_id",
                F.explode(F.split(F.lower("text"), "[^a-z0-9]+"))
                .alias("term"))
        .filter(F.col("term") != "")
        .filter(~F.col("term").isin(stops))
    )
    dl = field_toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    qt = field_toks.filter(F.col("term").isin(QUERY_TERMS))
    tf = qt.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "contrib",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5))
            * F.col("tf")
            / (F.col("tf") + 1.2 * (1.0 - 0.75
                                    + 0.75 * F.col("dl") / F.col("avgdl"))))
    )
    scored = contrib.groupBy("doc_id").agg(
        (F.round(F.sum("contrib") * 1e6)).cast("long").alias("score_e6"))
    return scored.orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(K)


def _lang_routed_sql():
    from ..analyzer import ENGLISH_STOPWORDS

    stops = ", ".join(repr(s) for s in sorted(ENGLISH_STOPWORDS))
    terms = ", ".join(repr(t) for t in QUERY_TERMS)
    # the routing decision (query language = 'en') is constant-folded
    # here: DuckDB sees the already-routed field, as Lucene would
    return f"""
    WITH toks AS (
      SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        FROM documents WHERE lang = 'en'
      ) WHERE term <> '' AND term NOT IN ({stops})),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ({terms}) GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id,
           CAST(round(sum(
             ln(1 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + 1.2 * (1 - 0.75
                                       + 0.75 * dl.dl / corpus.avgdl))
           ) * 1e6) AS BIGINT) AS score_e6
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id), corpus
    GROUP BY tf.doc_id
    ORDER BY score_e6 DESC, tf.doc_id LIMIT {K}
"""


FTS_BM25_LANG_ROUTED_SQL = _lang_routed_sql()


QUERIES = {
    "fts_corpus_stats": (fts_corpus_stats, FTS_CORPUS_STATS_SQL),
    "fts_by_hashtag_keyset": (fts_by_hashtag_keyset,
                              FTS_BY_HASHTAG_KEYSET_SQL),
    "fts_term_stats": (fts_term_stats, FTS_TERM_STATS_SQL),
    "fts_search_conversations": (fts_search_conversations,
                                 FTS_SEARCH_CONVERSATIONS_SQL),
    "fts_bm25_topk": (fts_bm25_topk, FTS_BM25_TOPK_SQL),
    "fts_bm25_filtered": (fts_bm25_filtered, FTS_BM25_FILTERED_SQL),
    "fts_bm25_lang_routed": (fts_bm25_lang_routed,
                             FTS_BM25_LANG_ROUTED_SQL),
    "fts_conjunctive_and": (fts_conjunctive_and, FTS_CONJUNCTIVE_AND_SQL),
    "fts_prefix_and": (fts_prefix_and, FTS_PREFIX_AND_SQL),
}

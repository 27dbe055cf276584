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

All Spark plans here are pure DataFrame algebra — whole-stage-
codegen'd, no python in the hot path.  Since round 3 the BM25 twins
are *expression-shaped*: tokenization, doc length, and per-query-term
tf are per-row array expressions (``split``/``filter``/``size`` over
one materialized token array), corpus stats (N, avgdl) and per-term
df collapse into ONE single-row aggregate broadcast back over the
matched rows, and the per-doc score is a row-local sum — no token
explode, no dl join, no per-doc groupBy.  The only shuffle left in
``fts_bm25_topk`` is the map-side-combined 1-row stats aggregate;
at 100 TB that plan reads each text partition once and moves bytes
only for the top-k merge.  The DuckDB oracles keep the relational
unnest/join formulation, so the hash comparison also proves the two
formulations equivalent.
"""

from __future__ import annotations

import functools
import operator

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


def _eq_lam(F, t):
    """Unary lambda ``x -> x == t`` for higher-order functions.

    Must be built by a factory, NOT written inline as
    ``lambda x, t=t: ...``: PySpark counts the lambda's parameters to
    decide the higher-order-function arity, so a default argument
    turns it into the binary ``(element, index)`` form and the
    "constant" silently becomes the array index column."""
    return lambda x: x == F.lit(t)


def _startswith_lam(p):
    """Unary ``x -> x.startswith(p)`` (see ``_eq_lam`` on why)."""
    return lambda x: x.startswith(p)


def _docs(spark, sf_dir):
    from ._parallel import ensure_parallelism

    return ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _toks_arr(text_col="text"):
    """Token ARRAY column — the ``simple`` analyzer as one row-local
    expression.  Referenced many times downstream, so CollapseProject
    keeps its projection boundary: the split runs once per row."""
    from pyspark.sql import functions as F

    return F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"),
                    lambda x: x != F.lit(""))


def fts_corpus_stats(spark, sf_dir):
    """N and avgdl — the corpus statistics Lucene maintains per
    segment.  dl is a row expression (``size`` of the token array);
    the whole entry is one map-side-combined single-row aggregate —
    no explode, no shuffle of token rows.  Docs that tokenize to
    nothing are excluded, matching the relational formulation (they
    contribute no token rows there)."""
    from pyspark.sql import functions as F

    dl = _docs(spark, sf_dir).select(F.size(_toks_arr()).alias("dl"))
    return dl.agg(
        F.sum((F.col("dl") > 0).cast("long")).alias("n_docs"),
        (F.round(F.avg(F.when(F.col("dl") > 0, F.col("dl"))) * 1e6))
        .cast("long").alias("avgdl_e6"))


FTS_CORPUS_STATS_SQL = f"""
    WITH toks AS ({_TOKS_SQL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)
    SELECT count(*) AS n_docs,
           CAST(round(avg(dl) * 1e6) AS BIGINT) AS avgdl_e6
    FROM dl
"""


def fts_term_stats(spark, sf_dir):
    """df per dictionary term (term_stats analogue).  Per-term
    presence is an ``array_contains`` row expression; the dfs land in
    ONE single-row aggregate which is then unpivoted driver-free with
    ``stack`` — no token explode, no per-term shuffle."""
    from pyspark.sql import functions as F

    base = _docs(spark, sf_dir).select(_toks_arr().alias("toks"))
    row = base.agg(*[
        F.sum(F.array_contains("toks", t).cast("long")).alias(f"df_{i}")
        for i, t in enumerate(DICT_TERMS)])
    args = ", ".join(f"'{t}', df_{i}" for i, t in enumerate(DICT_TERMS))
    return (row.select(F.expr(
        f"stack({len(DICT_TERMS)}, {args}) AS (term, df)"))
        .filter(F.col("df") > 0))


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

    return (_docs(spark, sf_dir)
            .select("doc_id", F.size(_toks_arr()).cast("long").alias("dl"))
            .filter(F.col("dl") > 0))


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

    scored = _bm25_scored(spark, sf_dir, QUERY_TERMS, keep=("source",))
    per_conv = (scored
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


def _bm25_scored(spark, sf_dir, q_terms, keep=()):
    """Shared BM25 scoring plan, expression-shaped (round 3).

    The semantics of the search path's query-term ⋈ postings join
    (reference: Index.java:304-313, executed by Lucene), re-expressed
    for Spark's execution model: per-doc dl and per-term tf are
    row-local array expressions over one materialized token array;
    N, avgdl, and every query term's df collapse into a SINGLE
    1-row aggregate (map-side combined) broadcast back over the
    term-matched rows; the per-doc score is a row-local sum over the
    T per-term contributions.  Zero joins on data-sized relations,
    zero per-doc shuffles — the old tf ⋈ dl join and per-doc groupBy
    moved into the row.  ``keep`` carries extra doc columns through
    (e.g. ``source`` for the conversation rollup).

    Numeric parity with the relational oracle: absent terms add an
    exact float 0.0 and the e6 rounding absorbs fold-order noise,
    the same tolerance the old groupBy-sum relied on.
    """
    from pyspark.sql import functions as F

    nt = len(q_terms)
    base = (_docs(spark, sf_dir)
            .select("doc_id", *keep, _toks_arr().alias("toks")))
    per_doc = base.select(
        "doc_id", *keep, F.size("toks").alias("dl"),
        *[F.size(F.filter("toks", _eq_lam(F, t)))
          .alias(f"tf_{i}") for i, t in enumerate(q_terms)])
    stats = per_doc.agg(
        F.sum((F.col("dl") > 0).cast("long")).alias("n"),
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(nt)])
    matched = per_doc.filter(functools.reduce(
        operator.or_, [F.col(f"tf_{i}") > 0 for i in range(nt)]))
    j = matched.crossJoin(F.broadcast(stats))
    contrib = None
    for i in range(nt):
        tf = F.col(f"tf_{i}").cast("double")
        c = (F.log(1.0 + (F.col("n") - F.col(f"df_{i}") + 0.5)
                   / (F.col(f"df_{i}") + 0.5))
             * tf
             / (tf + 1.2 * (1.0 - 0.75
                            + 0.75 * F.col("dl") / F.col("avgdl"))))
        c = F.when(F.col(f"tf_{i}") > 0, c).otherwise(F.lit(0.0))
        contrib = c if contrib is None else contrib + c
    return j.select(
        "doc_id", *keep,
        (F.round(contrib * 1e6)).cast("long").alias("score_e6"))


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
    """Conjunctive match: docs containing ALL query terms.  At index
    scale this is posting-list intersection (SURVEY §2.3: join on
    doc_id — the engine's ``fts_prefix_and`` semi-join chain shows
    that shape); over the raw table the AND is a row-local
    ``array_contains`` conjunction — a pure scan-filter, zero
    shuffles, filter pushed to the row."""
    from pyspark.sql import functions as F

    return (_docs(spark, sf_dir)
            .select("doc_id", _toks_arr().alias("toks"))
            .filter(functools.reduce(
                operator.and_,
                [F.array_contains("toks", t) for t in QUERY_TERMS]))
            .select("doc_id"))


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

    Spark shape over the raw table: per-prefix presence is a
    row-local ``exists(toks, startswith)`` and the AND is their
    conjunction — a pure scan-filter; the distinct matching-term
    count is ``size(array_distinct(filter(...)))`` on the same row.
    Zero shuffles (the old per-prefix distinct + semi-join chain
    shuffled every doc set; at index scale the engine does the
    semi-join over the sorted term dictionary instead — see
    ``FTSIndex.search`` prefix handling)."""
    from pyspark.sql import functions as F

    base = _docs(spark, sf_dir) \
        .select("doc_id", _toks_arr().alias("toks"))
    sel = base.filter(functools.reduce(
        operator.and_,
        [F.exists("toks", _startswith_lam(p))
         for p in PREFIXES]))
    pmatch = F.filter(
        "toks", lambda x: functools.reduce(
            operator.or_, [x.startswith(p) for p in PREFIXES]))
    return sel.select(
        "doc_id",
        F.size(F.array_distinct(pmatch)).cast("long")
        .alias("n_prefix_terms"))


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
    nt = len(QUERY_TERMS)
    # the routed field's analyzer chain as one row expression:
    # simple tokenizer + the field's stop set (expression-shaped like
    # _bm25_scored — single-row stats aggregate, row-local score)
    toks_arr = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"),
        lambda x: (x != F.lit("")) & ~x.isin(stops))
    per_doc = (
        _docs(spark, sf_dir)
        .filter(F.col("lang") == qlang)
        .select("doc_id", toks_arr.alias("toks"))
        .select("doc_id", F.size("toks").alias("dl"),
                *[F.size(F.filter("toks", _eq_lam(F, t)))
                  .alias(f"tf_{i}")
                  for i, t in enumerate(QUERY_TERMS)]))
    stats = per_doc.agg(
        F.sum((F.col("dl") > 0).cast("long")).alias("n"),
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(nt)])
    matched = per_doc.filter(functools.reduce(
        operator.or_, [F.col(f"tf_{i}") > 0 for i in range(nt)]))
    j = matched.crossJoin(F.broadcast(stats))
    contrib = None
    for i in range(nt):
        tf = F.col(f"tf_{i}").cast("double")
        c = (F.log(1.0 + (F.col("n") - F.col(f"df_{i}") + 0.5)
                   / (F.col(f"df_{i}") + 0.5))
             * tf
             / (tf + 1.2 * (1.0 - 0.75
                            + 0.75 * F.col("dl") / F.col("avgdl"))))
        c = F.when(F.col(f"tf_{i}") > 0, c).otherwise(F.lit(0.0))
        contrib = c if contrib is None else contrib + c
    scored = j.select(
        "doc_id",
        (F.round(contrib * 1e6)).cast("long").alias("score_e6"))
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


PHRASE = ["table", "merge"]   # adjacent-bigram phrase; ~40 doc hits


def _phrase_anchor_lam(F, phrase):
    """Unary HOF lambda ``i -> AND_j toks[i+j] == phrase[j]`` (1-based
    ``element_at``; factory-built — see ``_eq_lam`` on arity)."""
    def lam(i):
        cond = None
        for j, t in enumerate(phrase):
            c = F.element_at(F.col("toks"), i + j) == F.lit(t)
            cond = c if cond is None else cond & c
        return cond
    return lam


def fts_phrase_match_expr(spark, sf_dir):
    """Exact-phrase BM25 top-k — the ``match_phrase`` capability of
    the engine the reference delegates search to (Lucene PhraseQuery;
    the reference API itself stops at multi_match, Index.java:304-313).
    Expression-shaped twin of the engine's positional-index path
    (``FTSIndex.search_phrase`` over the ``positions`` table,
    query.py): tf = exact phrase frequency, idf = Σ idf over the
    distinct phrase terms, BM25 dl normalization.

    Since round 5 the DRIVER row ``fts_phrase_match`` runs the real
    positional engine (operators/engine_serving.py) against the same
    DuckDB oracle; this twin stays as the rank-parity cross-check
    (tests/test_round5_fixes.py) and as the HOF-only formulation.

    The phrase frequency is a ROW-LOCAL expression: count the anchor
    positions ``i`` where ``toks[i..i+m-1]`` equals the phrase — a
    filtered 1..n sequence over one materialized token array (no
    token explode, no position self-join; ``toks`` is projected once
    so the HOF lambda references a column, not a re-evaluated
    expression).  Corpus stats collapse into the same single-row
    broadcast aggregate every BM25 twin uses; the only shuffle is
    that 1-row aggregate plus the top-k merge.  The DuckDB oracle
    keeps the relational formulation (positions via parallel unnest,
    adjacency self-join) so the hash match also proves the two
    formulations equivalent."""
    from pyspark.sql import functions as F

    m = len(PHRASE)
    terms = sorted(set(PHRASE))
    base = (_docs(spark, sf_dir)
            .select("doc_id", _toks_arr().alias("toks")))
    nmax = F.size("toks") - (m - 1)
    ptf = F.when(nmax >= 1, F.size(F.filter(
        F.sequence(F.lit(1), nmax),
        _phrase_anchor_lam(F, PHRASE)))).otherwise(F.lit(0))
    per_doc = base.select(
        "doc_id", F.size("toks").alias("dl"),
        ptf.cast("long").alias("ptf"),
        *[F.size(F.filter("toks", _eq_lam(F, t)))
          .alias(f"tf_{i}") for i, t in enumerate(terms)])
    stats = per_doc.agg(
        F.sum((F.col("dl") > 0).cast("long")).alias("n"),
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))])
    j = (per_doc.filter(F.col("ptf") > 0)
         .crossJoin(F.broadcast(stats)))
    sum_idf = None
    for i in range(len(terms)):   # sorted-term fold, as the engine
        c = F.log(1.0 + (F.col("n") - F.col(f"df_{i}") + 0.5)
                  / (F.col(f"df_{i}") + 0.5))
        sum_idf = c if sum_idf is None else sum_idf + c
    ptf_d = F.col("ptf").cast("double")
    score = (sum_idf * ptf_d
             / (ptf_d + 1.2 * (1.0 - 0.75
                               + 0.75 * F.col("dl") / F.col("avgdl"))))
    return (j.select("doc_id", "ptf",
                     F.round(score * 1e6).cast("long").alias("score_e6"))
            .orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(K))


def _phrase_sql(phrase: list[str]) -> str:
    """DuckDB oracle for any phrase length: positions via parallel
    unnest, one adjacency self-join per extra slot (generalized so the
    SQL can never silently disagree with the Spark twin's
    ``m = len(PHRASE)``)."""
    joins = "\n".join(
        f"            JOIN pos t{j} ON t{j}.doc_id = t0.doc_id"
        f"\n                       AND t{j}.pos = t0.pos + {j}"
        f"\n                       AND t{j}.term = {t!r}"
        for j, t in enumerate(phrase[1:], start=1))
    return f"""
    WITH tokarr AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents),
    pos AS (SELECT doc_id, unnest(l) AS term,
                   unnest(range(1, len(l) + 1)) AS pos
            FROM tokarr),
    dl AS (SELECT doc_id, len(l) AS dl FROM tokarr WHERE len(l) > 0),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM pos
           WHERE term IN ({", ".join(repr(t) for t in sorted(set(phrase)))})
           GROUP BY term),
    sumidf AS (SELECT sum(ln(1 + (corpus.n - df.df + 0.5)
                              / (df.df + 0.5))) AS sidf
               FROM df, corpus),
    ptf AS (SELECT t0.doc_id, count(*) AS ptf
            FROM pos t0
{joins}
            WHERE t0.term = {phrase[0]!r}
            GROUP BY t0.doc_id)
    SELECT ptf.doc_id, ptf.ptf,
           CAST(round(sidf * ptf.ptf
                      / (ptf.ptf + 1.2 * (1 - 0.75
                                          + 0.75 * dl.dl / corpus.avgdl))
                      * 1e6) AS BIGINT) AS score_e6
    FROM ptf JOIN dl USING (doc_id), corpus, sumidf
    ORDER BY score_e6 DESC, ptf.doc_id LIMIT {K}
"""


FTS_PHRASE_MATCH_SQL = _phrase_sql(PHRASE)


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
    # fts_phrase_match registers in operators/engine_serving.py since
    # round 5 (real positional engine, same oracle)
}

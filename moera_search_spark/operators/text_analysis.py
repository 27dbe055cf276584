"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting, fingerprinting, hashtag extraction.

The reference's equivalents: lingua language detection
(index/LanguageAnalyzer.java:17-40), HTML cleaning
(util/Util.java:77-82), hashtag regex (util/BodyUtil.java:18-20) —
restated as JVM-side expression plans (regexp / split / aggregate),
no python in the hot path, each with a DuckDB oracle twin.
"""

from __future__ import annotations

# tiny deterministic stopword marker sets per language (heuristic LID)
LID_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def text_token_counts(spark, sf_dir):
    """Token counting: whitespace tokens + alnum-run tokens (the
    BPE-ish regex count) per doc."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                         lambda x: x != ""))
    alnum = F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                            lambda x: x != ""))
    return d.select("doc_id", ws.cast("long").alias("ws_tokens"),
                    alnum.cast("long").alias("alnum_tokens"))


TEXT_TOKEN_COUNTS_SQL = r"""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'),
                           x -> x <> '')) AS ws_tokens,
           len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS alnum_tokens
    FROM documents
"""


def text_quality_score(spark, sf_dir):
    """Quality scoring: length, mean word length, stopword ratio →
    composite (the heuristic-filter stage of a training-data
    pipeline)."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda x: x != "")
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*LID_MARKERS["en"])))
    stop_ratio = F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0))
    mean_wlen = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0),
                    lambda acc, x: acc + F.length(x)).cast("double")
        / n_toks).otherwise(F.lit(0.0))
    score = (F.least(n_toks / 100.0, F.lit(1.0)) * 0.5
             + stop_ratio * 0.3
             + F.least(mean_wlen / 10.0, F.lit(1.0)) * 0.2)
    return d.select(
        "doc_id", F.length("text").cast("long").alias("n_chars"),
        n_toks.cast("long").alias("n_tokens"),
        F.round(stop_ratio * 1e6).cast("long").alias("stop_ratio_e6"),
        F.round(score * 1e6).cast("long").alias("quality_e6"))


_STOPS = ", ".join(repr(s) for s in LID_MARKERS["en"])
TEXT_QUALITY_SCORE_SQL = f"""
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents),
    m AS (
      SELECT doc_id, n_chars, len(toks) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               len(list_filter(toks, x -> x IN ({_STOPS})))
               / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS DOUBLE) / len(toks) ELSE 0.0 END AS mean_wlen
      FROM t)
    SELECT doc_id, n_chars, n_tokens,
           CAST(round(stop_ratio * 1e6) AS BIGINT) AS stop_ratio_e6,
           CAST(round((least(n_tokens / 100.0, 1.0) * 0.5
                       + stop_ratio * 0.3
                       + least(mean_wlen / 10.0, 1.0) * 0.2) * 1e6)
                AS BIGINT) AS quality_e6
    FROM m
"""


def text_lang_id(spark, sf_dir):
    """Heuristic language ID via per-language stopword hit counts —
    the lingua-detector analogue (LanguageAnalyzer.java:21-40), as a
    pure expression plan.  Picks the language with the most marker
    hits; ties and zero-hit docs → 'und'."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda x: x != "")
    counts = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*markers)))
        for lang, markers in LID_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    pred = F.when(best == 0, "und")
    for lang in LID_MARKERS:  # first max wins, fixed iteration order
        pred = pred.when(counts[lang] == best, lang)
    return d.select("doc_id", pred.alias("pred_lang"), "lang")


def _lid_sql():
    cases = []
    for lang, markers in LID_MARKERS.items():
        ms = ", ".join(repr(m) for m in markers)
        cases.append(
            f"len(list_filter(toks, x -> x IN ({ms}))) AS c_{lang}")
    best = "greatest(" + ", ".join(f"c_{l}" for l in LID_MARKERS) + ")"
    whens = "\n           ".join(
        f"WHEN c_{l} = {best} THEN '{l}'" for l in LID_MARKERS)
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents),
    c AS (SELECT doc_id, lang, {", ".join(cases)} FROM t)
    SELECT doc_id,
           CASE WHEN {best} = 0 THEN 'und'
           {whens}
           END AS pred_lang, lang
    FROM c
"""


TEXT_LANG_ID_SQL = _lid_sql()


def text_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (the rolling-hash fingerprint slot; md5 keeps the oracle
    cross-engine)."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return d.select("doc_id", F.md5(norm).alias("fp"))


TEXT_FINGERPRINT_SQL = r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
"""


def text_hashtag_extract(spark, sf_dir):
    """Hashtag extraction (BodyUtil.java:18-20,83-93) — documents get a
    synthetic leading tag so the op has matches; regexp_extract_all +
    explode."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    tagged = F.concat(F.lit("#"), F.col("source"), F.lit(" "),
                      F.col("text"))
    tags = F.regexp_extract_all(tagged, F.lit(r"#[a-z0-9_]+"), 0)
    return (d.select("doc_id", F.explode(tags).alias("tag"))
            .groupBy("tag").agg(F.count("*").alias("n")))


TEXT_HASHTAG_EXTRACT_SQL = """
    SELECT tag, count(*) AS n FROM (
      SELECT doc_id,
             unnest(regexp_extract_all('#' || source || ' ' || text,
                                       '#[a-z0-9_]+')) AS tag
      FROM documents)
    GROUP BY tag
"""


def text_html_strip(spark, sf_dir):
    """clearHtml semantics (Util.java:77-82): strip tags → space; shown
    over synthetic wrapped text so the op has effect."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    wrapped = F.concat(F.lit("<p>"), F.substring("text", 1, 40),
                       F.lit("</p>"))
    return d.select(
        "doc_id",
        F.regexp_replace(wrapped, r"(?i)</?[a-z][^>]*>", " ")
        .alias("cleaned"))


TEXT_HTML_STRIP_SQL = """
    SELECT doc_id,
           regexp_replace('<p>' || substr(text, 1, 40) || '</p>',
                          '(?i)</?[a-z][^>]*>', ' ', 'g') AS cleaned
    FROM documents
"""


QUERIES = {
    "text_token_counts": (text_token_counts, TEXT_TOKEN_COUNTS_SQL),
    "text_quality_score": (text_quality_score, TEXT_QUALITY_SCORE_SQL),
    "text_lang_id": (text_lang_id, TEXT_LANG_ID_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
    "text_hashtag_extract":
        (text_hashtag_extract, TEXT_HASHTAG_EXTRACT_SQL),
    "text_html_strip": (text_html_strip, TEXT_HTML_STRIP_SQL),
}

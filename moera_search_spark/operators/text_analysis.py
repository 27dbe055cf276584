"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting, fingerprinting, hashtag extraction, HTML
stripping, consolidated into two per-doc profile entries (one catalog
row each keeps every operator inside the driver's checked window).

The reference's equivalents: lingua language detection
(index/LanguageAnalyzer.java:17-40), HTML cleaning
(util/Util.java:77-82), hashtag regex (util/BodyUtil.java:18-20) —
restated as JVM-side expression plans (regexp / split / aggregate),
no python in the hot path, each with a DuckDB oracle twin.
"""

from __future__ import annotations

# winnowing fingerprint parameters: k-gram length and window width —
# guarantees any match of length >= WINNOW_K + WINNOW_W - 1 shares a
# fingerprint hash (the scheme's coverage theorem)
WINNOW_K = 8
WINNOW_W = 4

# tiny deterministic stopword marker sets per language (heuristic LID)
LID_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def _docs(spark, sf_dir):
    from ._parallel import ensure_parallelism

    return ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))


def text_doc_profile(spark, sf_dir):
    """Per-doc text profile — four operators in one projection:

    * token counting: whitespace tokens + alnum-run tokens (the
      BPE-ish regex count);
    * quality scoring: length, mean word length, stopword ratio →
      composite (the heuristic-filter stage of a training pipeline);
    * heuristic language ID via per-language stopword-marker hit
      counts — the lingua-detector analogue
      (LanguageAnalyzer.java:21-40); ties / zero hits → 'und'
      (the full en/ru analyzer-routing path lives in the engine:
      analyzer.detect_language + mode='bilingual', see analyzer.py);
    * document fingerprint: md5 over whitespace-normalized lowercase
      text (the content-hash dedup key, same fingerprint the
      dedup_exact entry groups by);
    * winnowing fingerprint (Schleimer/Wilkerson/Aiken 2003, the MOSS
      scheme): hash every ``WINNOW_K``-char gram of the normalized
      text, keep the minimum per sliding window of ``WINNOW_W``
      positions, fingerprint = the distinct kept hashes — the
      rolling-hash local fingerprint that detects partial overlap
      where the exact md5 only detects identity.  Pure JVM
      higher-order functions (``transform`` over ``sequence`` +
      ``array_min``/``slice``); the per-gram hash is the same
      md5-derived 48-bit integer the dedup family uses, so DuckDB
      reproduces it bit-for-bit.
    """
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                         lambda x: x != ""))
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
    counts = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*markers)))
        for lang, markers in LID_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    lid = F.when(best == 0, "und")
    for lang in LID_MARKERS:  # first max wins, fixed iteration order
        lid = lid.when(counts[lang] == best, lang)
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    # winnowing: positions 1..n-k+1 → 48-bit md5 gram hashes →
    # min per w-wide window → distinct sorted set, digested to one
    # md5 so the column stays row-sized whatever the doc length.
    # The windowed min is a zip_with/least chain over SHIFTED slices
    # of the gram array (w-1 zips), NOT array_min(slice(...)) inside
    # a transform lambda: expressions are inlined per lambda call, so
    # the slice form re-evaluates the whole gram transform at every
    # window position — O(n²) md5s/doc, measured 64 s for 500 docs vs
    # ~4 s for this shape.  zip_with pads the shorter side with nulls
    # and `least` skips nulls, so the tail is trimmed afterwards.
    n_grams = F.length(norm) - (WINNOW_K - 1)
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: F.conv(F.substring(F.md5(F.substring(norm, i,
                                                       WINNOW_K)),
                                     1, 12), 16, 10).cast("long"))
    mins = gram_hashes
    for s in range(1, WINNOW_W):
        mins = F.zip_with(mins,
                          F.slice(gram_hashes, s + 1,
                                  F.greatest(n_grams - s, F.lit(1))),
                          lambda a, b: F.least(a, b))
    kept = F.slice(mins, 1, F.greatest(n_grams - (WINNOW_W - 1),
                                       F.lit(1)))
    winnow = F.when(
        n_grams >= WINNOW_W,
        F.md5(F.array_join(F.array_sort(F.array_distinct(kept)), ",")))
    return d.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        n_toks.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(stop_ratio * 1e6).cast("long").alias("stop_ratio_e6"),
        F.round(score * 1e6).cast("long").alias("quality_e6"),
        lid.alias("pred_lang"),
        "lang",
        F.md5(norm).alias("fp"),
        winnow.alias("fp_winnow"))


def _profile_sql():
    stops = ", ".join(repr(s) for s in LID_MARKERS["en"])
    cases = []
    for lang, markers in LID_MARKERS.items():
        ms = ", ".join(repr(m) for m in markers)
        cases.append(
            f"len(list_filter(toks, x -> x IN ({ms}))) AS c_{lang}")
    best = "greatest(" + ", ".join(f"c_{l}" for l in LID_MARKERS) + ")"
    whens = "\n           ".join(
        f"WHEN c_{l} = {best} THEN '{l}'" for l in LID_MARKERS)
    k, w = WINNOW_K, WINNOW_W
    return rf"""
    WITH t AS (
      SELECT doc_id, lang, text, length(text) AS n_chars,
             len(list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '')) AS ws_tokens,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      FROM documents),
    wn AS (
      SELECT doc_id,
             CASE WHEN length(norm) - {k - 1} >= {w} THEN
               md5(array_to_string(list_sort(list_distinct(
                 list_transform(
                   range(1, length(norm) - {k - 1} - {w - 1} + 1),
                   j -> list_min(list_transform(
                          range(j, j + {w}),
                          i -> CAST('0x' || substr(md5(substr(norm, i,
                                                              {k})),
                                                   1, 12) AS BIGINT))))
               )), ','))
             END AS fp_winnow
      FROM t),
    m AS (
      SELECT doc_id, lang, text, n_chars, ws_tokens,
             len(toks) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               len(list_filter(toks, x -> x IN ({stops})))
               / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS DOUBLE) / len(toks) ELSE 0.0 END AS mean_wlen,
             {", ".join(cases)}
      FROM t)
    SELECT doc_id, ws_tokens, n_tokens, n_chars,
           CAST(round(stop_ratio * 1e6) AS BIGINT) AS stop_ratio_e6,
           CAST(round((least(n_tokens / 100.0, 1.0) * 0.5
                       + stop_ratio * 0.3
                       + least(mean_wlen / 10.0, 1.0) * 0.2) * 1e6)
                AS BIGINT) AS quality_e6,
           CASE WHEN {best} = 0 THEN 'und'
           {whens}
           END AS pred_lang,
           lang,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
           wn.fp_winnow
    FROM m JOIN wn USING (doc_id)
"""


TEXT_DOC_PROFILE_SQL = _profile_sql()


def text_extract_transform(spark, sf_dir):
    """Per-doc text transforms — three operators in one projection:

    * hashtag extraction (BodyUtil.java:18-20,83-93) — documents get a
      synthetic leading tag so the op has matches; regexp_extract_all,
      sorted + joined so the value hash is representation-independent;
    * clearHtml semantics (Util.java:77-82): strip tags → space, shown
      over synthetic wrapped text so the op has effect;
    * indexed-text concat: body + preview-title + media-text space-join
      (IndexedDocument.java:79-97 joins body with link-preview titles/
      descriptions; util/MediaTextUtil.java:17-60 space-joins per-
      attachment title+textContent) — ``concat_ws`` with null-skipping
      semantics (absent parts vanish, exactly the reference's
      filter-null-then-join).
    """
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    tagged = F.concat(F.lit("#"), F.col("source"), F.lit(" "),
                      F.col("text"))
    tags = F.regexp_extract_all(tagged, F.lit(r"#[a-z0-9_]+"), 0)
    wrapped = F.concat(F.lit("<p>"), F.substring("text", 1, 40),
                       F.lit("</p>"))
    preview_title = F.when(F.col("n_chars") > 200, F.col("source"))
    media_text = F.when(F.col("lang") == "en", F.lit("media-alt"))
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(tags), " ").alias("tags"),
        F.regexp_replace(wrapped, r"(?i)</?[a-z][^>]*>", " ")
        .alias("cleaned"),
        F.concat_ws(" ", F.substring("text", 1, 30), preview_title,
                    media_text).alias("indexed_text"))


TEXT_EXTRACT_TRANSFORM_SQL = """
    SELECT doc_id,
           array_to_string(list_sort(
             regexp_extract_all('#' || source || ' ' || text,
                                '#[a-z0-9_]+')), ' ') AS tags,
           regexp_replace('<p>' || substr(text, 1, 40) || '</p>',
                          '(?i)</?[a-z][^>]*>', ' ', 'g') AS cleaned,
           concat_ws(' ', substr(text, 1, 30),
                     CASE WHEN length(text) > 200 THEN source END,
                     CASE WHEN lang = 'en' THEN 'media-alt' END)
             AS indexed_text
    FROM documents
"""


QUERIES = {
    "text_doc_profile": (text_doc_profile, TEXT_DOC_PROFILE_SQL),
    "text_extract_transform":
        (text_extract_transform, TEXT_EXTRACT_TRANSFORM_SQL),
}

"""Scalar-function and remaining operator parity (SURVEY.md §2.2, §2.4,
§2.5, §2.7) — each Spark plan paired with DuckDB oracle SQL.

Covers the reference's hardwired helper surface that earlier modules
didn't: JSON decode of stringly-typed props (reference:
data/EntryRepository.java:332-335 decodes Comment.repliedTo JSON;
job/Jobs.java:245-246 job parameters/state), epoch⇄timestamp
conversion (util/Util.java:16-18), video-presence regex
(util/BodyUtil.java:17,50), base64/hex codecs (util/Util.java:31-64),
the sheriff-mark array anti-filter (data/NodeSearchRepository.java:21-29,
reused 10×), the node-activity decayed aggregate
(data/NodeRepository.java:595-617), and the suggestions strata merge
with dedup (rest/SearchNodesController.java:146-180,259-311).
"""

from __future__ import annotations

VIDEO_RE = "(?i)<(?:object|video|iframe)"
DECAY_HOURS = 24.0 * 30


def func_scalar_codecs(spark, sf_dir):
    """Scalar codec bundle over events: JSON-in-string decode to a
    typed column (from_json — the analogue of decoding repliedTo /
    job-state JSON blobs, data/EntryRepository.java:332-335,
    job/Jobs.java:245-246) + epoch-seconds and -millis conversion
    (Util.toTimestamp / toEpochSecond mixed units, doc/schema.txt:54
    vs :58) in one projection."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")   # parquet NTZ → session-UTC ts
    return ev.select(
        "event_id",
        F.from_json("props", "k int")["k"].cast("long").alias("k"),
        F.unix_timestamp(ts).alias("epoch_s"),
        (F.unix_millis(ts)).alias("epoch_ms"),
    ).orderBy("event_id").limit(1000)


FUNC_SCALAR_CODECS_SQL = """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k,
           epoch_us(ts) // 1000000 AS epoch_s,
           epoch_us(ts) // 1000 AS epoch_ms
    FROM events ORDER BY event_id LIMIT 1000
"""


def func_media_codecs(spark, sf_dir):
    """Media/body scalar bundle over documents: video-presence regex
    (BodyUtil.mediaInText, util/BodyUtil.java:17,50) + base64 / hex
    codecs over digest-sized byte strings (Util.java:31-64)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frag = F.substring("text", 1, 8).cast("binary")
    return docs.select(
        "doc_id",
        F.col("text").rlike(VIDEO_RE).alias("video_present"),
        F.base64(frag).alias("b64"),
        F.hex(frag).alias("hx"),
    ).filter(F.length("text") >= 8)


FUNC_MEDIA_CODECS_SQL = f"""
    SELECT doc_id,
           regexp_matches(text, '{VIDEO_RE}') AS video_present,
           base64(encode(substr(text, 1, 8))) AS b64,
           upper(hex(encode(substr(text, 1, 8)))) AS hx
    FROM documents WHERE length(text) >= 8
"""


def func_array_append_remove(spark, sf_dir):
    """Array append (if absent) / remove — the sheriffMarks list
    management (reference: data/PostingRepository.java:259-290:
    sheriffMark appends the sheriff to the marks list only when
    missing = array_union; sheriffUnmark filters it out =
    array_remove).  Arrays are sorted + joined to strings so the
    cross-engine value hash is representation-independent."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    marks = F.array("lang", "source")
    appended = F.array_union(marks, F.array(F.lit("sheriff:g-play")))
    removed = F.array_remove(marks, "en")
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(appended), ",").alias("marked"),
        F.array_join(F.array_sort(removed), ",").alias("unmarked"))


FUNC_ARRAY_APPEND_REMOVE_SQL = """
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
             list_concat([lang, source], ['sheriff:g-play']))), ',')
             AS marked,
           array_to_string(list_sort(
             list_filter([lang, source], x -> x <> 'en')), ',')
             AS unmarked
    FROM documents
"""


def filter_sheriff_marks(spark, sf_dir):
    """Array anti-filter with null-safe coalesce — exclude rows whose
    marks array contains the sheriff (NodeSearchRepository.java:21-29:
    NOT (sheriff IN coalesce(n.sheriffMarks, [])))."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    marks = F.array("lang", "source")
    return (docs
            .filter(~F.coalesce(F.array_contains(marks, "en"),
                                F.lit(False)))
            .select("doc_id", "lang", "source"))


FILTER_SHERIFF_MARKS_SQL = """
    SELECT doc_id, lang, source FROM documents
    WHERE NOT coalesce(list_contains([lang, source], 'en'), false)
"""


def agg_node_activity(spark, sf_dir):
    """Node activity: Σ (1 − (age_h / decayHours)²) over recent events
    per user (NodeRepository.java:595-617; constants Workload.java:39-41).

    Per-row contributions are rounded to integer micro-units BEFORE
    the sum, so the aggregate is an exact int64 — immune to the
    nondeterministic partial-agg float-sum order that could flip a
    round-after-sum value near a .5 boundary cross-engine."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    now = ev.agg(F.max("ts").alias("now"))
    # microsecond-exact age so the DuckDB oracle (epoch_us) matches
    age_h = (F.unix_micros(F.col("now").cast("timestamp"))
             - F.unix_micros(F.col("ts").cast("timestamp"))) / 3.6e9
    contrib = 1.0 - F.pow(F.col("age_h") / DECAY_HOURS, 2)
    return (ev.crossJoin(F.broadcast(now))
            .withColumn("age_h", age_h)
            .filter(F.col("age_h") < DECAY_HOURS)
            .groupBy("user_id")
            .agg(F.sum(F.round(contrib * 1e6).cast("long"))
                 .alias("activity_e6")))


AGG_NODE_ACTIVITY_SQL = f"""
    WITH now AS (SELECT max(ts) AS now FROM events),
    aged AS (
      SELECT user_id,
             (epoch_us(now.now) - epoch_us(ts)) / 3.6e9 AS age_h
      FROM events, now)
    SELECT user_id,
           CAST(sum(CAST(round((1.0 - (age_h / {DECAY_HOURS})^2) * 1e6)
                         AS BIGINT)) AS BIGINT) AS activity_e6
    FROM aged WHERE age_h < {DECAY_HOURS}
    GROUP BY user_id
"""


def rank_suggestions_merge(spark, sf_dir):
    """Strata merge with dedup: two ranked candidate lists (the
    by-name / by-full-name suggestion queries) unioned, first stratum
    wins duplicates, interleaved by per-stratum rank
    (SearchNodesController.java:146-180 dedup via HashSet used); the
    union+distinct of candidate subqueries
    (PostingRepository.java:543-549) is the same shape.

    Scale shape: each stratum's candidates are cut to its page depth
    (20) FIRST with a distributed orderBy+limit
    (``TakeOrderedAndProject``); the per-stratum rank window then runs
    over ≤ 20 rows instead of funnelling the whole stratum through a
    single-partition global window (the round-1 plan's weakness)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def stratum(pred_df, tag, order_cols):
        top = (pred_df.select("doc_id", "n_chars")
               .orderBy(*order_cols).limit(20))
        return (top.withColumn("stratum", F.lit(tag))
                .withColumn("rn", F.row_number().over(
                    Window.partitionBy(F.lit(1)).orderBy(*order_cols))))

    s1 = stratum(docs.filter(F.col("source") == "src1"), 1,
                 [F.desc("n_chars"), F.asc("doc_id")])
    s2 = stratum(docs.filter(F.col("lang") == "en"), 2,
                 [F.asc("n_chars"), F.asc("doc_id")])
    both = s1.unionByName(s2).drop("n_chars")
    first = (both.withColumn("pick", F.row_number().over(
        Window.partitionBy("doc_id").orderBy("stratum")))
        .filter(F.col("pick") == 1))
    return (first.orderBy("rn", "stratum", "doc_id")
            .limit(10)
            .select("doc_id",
                    F.col("stratum").cast("long").alias("stratum"),
                    F.col("rn").cast("long").alias("rn")))


RANK_SUGGESTIONS_MERGE_SQL = """
    WITH s1 AS (
      SELECT doc_id, CAST(1 AS BIGINT) AS stratum,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents WHERE source = 'src1'),
    s2 AS (
      SELECT doc_id, CAST(2 AS BIGINT) AS stratum,
             row_number() OVER (ORDER BY n_chars ASC, doc_id) AS rn
      FROM documents WHERE lang = 'en'),
    both_s AS (
      SELECT * FROM s1 WHERE rn <= 20
      UNION ALL SELECT * FROM s2 WHERE rn <= 20),
    first_pick AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY stratum) AS pick
      FROM both_s)
    SELECT doc_id, stratum, rn FROM first_pick WHERE pick = 1
    ORDER BY rn, stratum, doc_id LIMIT 10
"""


QUERIES = {
    "func_scalar_codecs": (func_scalar_codecs, FUNC_SCALAR_CODECS_SQL),
    "func_media_codecs": (func_media_codecs, FUNC_MEDIA_CODECS_SQL),
    "func_array_append_remove": (func_array_append_remove,
                                 FUNC_ARRAY_APPEND_REMOVE_SQL),
    "filter_sheriff_marks": (filter_sheriff_marks,
                             FILTER_SHERIFF_MARKS_SQL),
    "agg_node_activity": (agg_node_activity, AGG_NODE_ACTIVITY_SQL),
    "rank_suggestions_merge": (rank_suggestions_merge,
                               RANK_SUGGESTIONS_MERGE_SQL),
}

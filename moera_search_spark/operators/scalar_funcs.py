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


def func_json_decode(spark, sf_dir):
    """JSON-in-string decode to typed column (from_json), the analogue
    of decoding repliedTo / job-state JSON blobs."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.select(
        "event_id",
        F.from_json("props", "k int")["k"].cast("long").alias("k"))
        .filter(F.col("k") > 50))


FUNC_JSON_DECODE_SQL = """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
    FROM events
    WHERE CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) > 50
"""


def func_epoch_roundtrip(spark, sf_dir):
    """Epoch-seconds and -millis from timestamps (Util.toTimestamp /
    toEpochSecond mixed units, doc/schema.txt:54 vs :58)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")   # parquet NTZ → session-UTC ts
    return ev.select(
        "event_id",
        F.unix_timestamp(ts).alias("epoch_s"),
        (F.unix_millis(ts)).alias("epoch_ms"),
    ).orderBy("event_id").limit(1000)


FUNC_EPOCH_ROUNDTRIP_SQL = """
    SELECT event_id,
           epoch_us(ts) // 1000000 AS epoch_s,
           epoch_us(ts) // 1000 AS epoch_ms
    FROM events ORDER BY event_id LIMIT 1000
"""


def func_video_detect(spark, sf_dir):
    """Video-presence regex over body text (BodyUtil.mediaInText)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.col("text").rlike(VIDEO_RE).alias("video_present"))


FUNC_VIDEO_DETECT_SQL = f"""
    SELECT doc_id,
           regexp_matches(text, '{VIDEO_RE}') AS video_present
    FROM documents
"""


def func_base64_hex(spark, sf_dir):
    """Base64 / hex codecs over digest-sized byte strings
    (Util.java:31-64)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frag = F.substring("text", 1, 8).cast("binary")
    return docs.select(
        "doc_id",
        F.base64(frag).alias("b64"),
        F.hex(frag).alias("hx"),
    ).filter(F.length("text") >= 8)


FUNC_BASE64_HEX_SQL = """
    SELECT doc_id,
           base64(encode(substr(text, 1, 8))) AS b64,
           upper(hex(encode(substr(text, 1, 8)))) AS hx
    FROM documents WHERE length(text) >= 8
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
    per user (NodeRepository.java:595-617; constants Workload.java:39-41)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    now = ev.agg(F.max("ts").alias("now"))
    # microsecond-exact age so the DuckDB oracle (epoch_us) matches
    age_h = (F.unix_micros(F.col("now").cast("timestamp"))
             - F.unix_micros(F.col("ts").cast("timestamp"))) / 3.6e9
    return (ev.crossJoin(F.broadcast(now))
            .withColumn("age_h", age_h)
            .filter(F.col("age_h") < DECAY_HOURS)
            .groupBy("user_id")
            .agg((F.round(F.sum(
                1.0 - F.pow(F.col("age_h") / DECAY_HOURS, 2)) * 1e6))
                .cast("long").alias("activity_e6")))


AGG_NODE_ACTIVITY_SQL = f"""
    WITH now AS (SELECT max(ts) AS now FROM events),
    aged AS (
      SELECT user_id,
             (epoch_us(now.now) - epoch_us(ts)) / 3.6e9 AS age_h
      FROM events, now)
    SELECT user_id,
           CAST(round(sum(1.0 - (age_h / {DECAY_HOURS})^2) * 1e6) AS BIGINT)
             AS activity_e6
    FROM aged WHERE age_h < {DECAY_HOURS}
    GROUP BY user_id
"""


def rank_suggestions_merge(spark, sf_dir):
    """Strata merge with dedup: two ranked candidate lists (the
    by-name / by-full-name suggestion queries) unioned, first stratum
    wins duplicates, interleaved by per-stratum rank
    (SearchNodesController.java:146-180 dedup via HashSet used)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = (docs.filter(F.col("source") == "src1")
          .withColumn("stratum", F.lit(1))
          .withColumn("rn", F.row_number().over(
              Window.partitionBy(F.lit(1))
              .orderBy(F.desc("n_chars"), F.asc("doc_id")))))
    s2 = (docs.filter(F.col("lang") == "en")
          .withColumn("stratum", F.lit(2))
          .withColumn("rn", F.row_number().over(
              Window.partitionBy(F.lit(1))
              .orderBy(F.asc("n_chars"), F.asc("doc_id")))))
    both = s1.unionByName(s2).filter(F.col("rn") <= 20)
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
    "func_json_decode": (func_json_decode, FUNC_JSON_DECODE_SQL),
    "func_epoch_roundtrip": (func_epoch_roundtrip,
                             FUNC_EPOCH_ROUNDTRIP_SQL),
    "func_video_detect": (func_video_detect, FUNC_VIDEO_DETECT_SQL),
    "func_base64_hex": (func_base64_hex, FUNC_BASE64_HEX_SQL),
    "filter_sheriff_marks": (filter_sheriff_marks,
                             FILTER_SHERIFF_MARKS_SQL),
    "agg_node_activity": (agg_node_activity, AGG_NODE_ACTIVITY_SQL),
    "rank_suggestions_merge": (rank_suggestions_merge,
                               RANK_SUGGESTIONS_MERGE_SQL),
}

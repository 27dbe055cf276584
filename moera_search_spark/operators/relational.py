"""Relational operator inventory (SURVEY.md §2.2–§2.7) over the
TPC-H-ish testdata tables — each entry restates one reference
capability as a Catalyst-optimizable DataFrame plan with a DuckDB
oracle twin.

Money sums are computed in integer cent-percent units
(``price_cents · (100 − discount_pct)``) so cross-engine float
summation order can never change a value hash — the same reason the
engine scores BM25 with deterministic reductions.
"""

from __future__ import annotations

NOW_MS = 1706745600000  # 2024-02-01T00:00:00Z, after all events
DAY_CUTOFF = "2024-01-30 00:00:00"
DECAY_HOURS = 24.0 * 30


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- filters

def filter_term_range_exists(spark, sf_dir):
    """term + range + exists predicate stack (Index.java:327-385,
    412-452): equality on a keyword field, gte/lte range, null checks —
    all pushed to the parquet scan by Catalyst."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "click")
                  & (F.col("value") >= 10.0) & (F.col("value") <= 50.0)
                  & (F.col("ts") >= "2024-01-05")
                  & (F.col("ts") < "2024-01-20")
                  & F.col("props").isNotNull())
        .select("event_id", "user_id", "value")
    )


FILTER_TERM_RANGE_EXISTS_SQL = """
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'click' AND value >= 10.0 AND value <= 50.0
      AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
      AND props IS NOT NULL
"""


def filter_in_case_coalesce(spark, sf_dir):
    """terms (IN-list) filter + CASE classification + coalesce default
    — the entryType switch and null_value defaulting of the reference
    (Index.java:454-467; EntryRepository.java:172-181;
    doc/mappings.txt:57-68)."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin(["click", "view", "purchase"]))
        .select(
            "event_id",
            F.when(F.col("value") > 50.0, "COMMENT")
            .otherwise("POSTING").alias("kind"),
            F.coalesce(F.col("props"), F.lit("{}")).alias("props_nn"))
    )


FILTER_IN_CASE_COALESCE_SQL = """
    SELECT event_id,
           CASE WHEN value > 50.0 THEN 'COMMENT' ELSE 'POSTING' END AS kind,
           coalesce(props, '{}') AS props_nn
    FROM events WHERE event_type IN ('click', 'view', 'purchase')
"""


def filter_prefix_ci(spark, sf_dir):
    """Case-folded prefix predicate — ``lower(n.name) STARTS WITH``
    (reference: NodeSearchRepository.java:72,95,227)."""
    from pyspark.sql import functions as F

    c = _t(spark, sf_dir, "customer")
    return (c.filter(F.lower(F.col("c_name")).startswith("customer#00000001"))
            .select("c_custkey", "c_name"))


FILTER_PREFIX_CI_SQL = """
    SELECT c_custkey, c_name FROM customer
    WHERE lower(c_name) LIKE 'customer#00000001%'
"""


def filter_regex_permutations(spark, sf_dir):
    """Word-order-permutation regex match: every term must prefix-match
    some word, in any order, case-insensitive, \\b-anchored — the
    fullName matcher (reference: NodeSearchRepository.java:169-217
    prefixRegex/termsRegex/termRegex)."""
    from pyspark.sql import functions as F

    p = _t(spark, sf_dir, "part")
    regex = r"(?i)(\bred\b.*\bwidget\b)|(\bwidget\b.*\bred\b)"
    return p.filter(F.col("p_name").rlike(regex)).select(
        "p_partkey", "p_name")


FILTER_REGEX_PERMUTATIONS_SQL = r"""
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name,
        '(?i)(\bred\b.*\bwidget\b)|(\bwidget\b.*\bred\b)')
"""


def filter_visibility_default(spark, sf_dir):
    """Anonymous-visibility predicate: absent principal defaults to
    public — ``coalesce(viewPrincipal,'public')='public'``
    (reference: Index.java:374-385; EntryRepository.java:150-152).
    'view' events model entries with NO stored principal (NULL), so
    the coalesce default branch is live on real rows — null-principal
    rows surface as 'public' and pass the filter."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    principal = F.when(F.col("event_type") == "view", None) \
        .otherwise(F.col("event_type"))
    vis = F.coalesce(principal, F.lit("public"))
    return (ev.select("event_id", vis.alias("visibility"))
            .filter(F.col("visibility").isin(["public", "click"])))


FILTER_VISIBILITY_DEFAULT_SQL = """
    SELECT event_id,
           coalesce(CASE WHEN event_type = 'view' THEN NULL
                         ELSE event_type END, 'public') AS visibility
    FROM events
    WHERE coalesce(CASE WHEN event_type = 'view' THEN NULL
                        ELSE event_type END, 'public')
          IN ('public', 'click')
"""


# ---------------------------------------------------------------- joins

def join_entry_source_owner(spark, sf_dir):
    """Entry→source→owner equi-join chain (EntryRepository.java:94,229)
    as lineitem⋈orders⋈customer; revenue per segment in exact integer
    cent-percent units.  Catalyst broadcasts the customer side."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (100 - F.round(F.col("l_discount") * 100).cast("long")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum(rev).alias("revenue_cp"),
             F.count("*").alias("n_items"))
    )


JOIN_ENTRY_SOURCE_OWNER_SQL = """
    SELECT c_mktsegment,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_cp,
           count(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


def join_semi_has_open_order(spark, sf_dir):
    """Existential semi-join (EXISTS pattern) — publication-in-feed /
    hashtag checks (EntryRepository.java:79-117) → left_semi."""
    from pyspark.sql import functions as F

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


JOIN_SEMI_HAS_OPEN_ORDER_SQL = """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def join_anti_no_orders(spark, sf_dir):
    """Exclusion anti-join — recommendations exclude already-seen /
    blocked (PostingRepository.java:552-580) → left_anti."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


JOIN_ANTI_NO_ORDERS_SQL = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_left_optional(spark, sf_dir):
    """OPTIONAL MATCH (left outer join) — avatar / media preview
    (EntryRepository.java:154-155): customers with order count incl 0."""
    from pyspark.sql import functions as F

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


JOIN_LEFT_OPTIONAL_SQL = """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
"""


def join_two_hop_distinct(spark, sf_dir):
    """1–2-hop expansion + DISTINCT (friend-of-friend seeding,
    NodeRepository.java:300-314): supplier→nation→customers, distinct
    customer count per high-balance supplier."""
    from pyspark.sql import functions as F

    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000.0)
    c = _t(spark, sf_dir, "customer")
    return (
        s.join(c, s.s_nationkey == c.c_nationkey)
        .groupBy("s_suppkey")
        .agg(F.countDistinct("c_custkey").alias("n_reach"))
    )


JOIN_TWO_HOP_DISTINCT_SQL = """
    SELECT s_suppkey, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_reach
    FROM supplier JOIN customer ON s_nationkey = c_nationkey
    WHERE s_acctbal > 5000.0 GROUP BY s_suppkey
"""


def join_fanout_ids(spark, sf_dir):
    """UNWIND id-list fan-out join (EntryRepository.java:219-228):
    hydrate N documents by id — broadcast the tiny id list."""
    from pyspark.sql import functions as F

    ids = [1, 7, 42, 99, 123, 250, 777]
    o = _t(spark, sf_dir, "orders")
    ids_df = spark.createDataFrame([(i,) for i in ids],
                                   "o_orderkey long")
    return (o.join(F.broadcast(ids_df), "o_orderkey")
            .select("o_orderkey", "o_custkey", "o_orderstatus"))


JOIN_FANOUT_IDS_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    WHERE o_orderkey IN (1, 7, 42, 99, 123, 250, 777)
"""


# ----------------------------------------------------------- aggregations

def agg_count_day_window(spark, sf_dir):
    """Per-key total + time-windowed COUNT subqueries — totalComments /
    dayComments (PostingRepository.java:24-51, windowed predicate
    ``c.createdAt > $yesterday`` at :50)."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("total_events"),
        F.count(F.when(F.col("ts") >= DAY_CUTOFF, 1)).alias("recent_events"))


AGG_COUNT_DAY_WINDOW_SQL = f"""
    SELECT user_id, count(*) AS total_events,
           count(CASE WHEN ts >= TIMESTAMP '{DAY_CUTOFF}' THEN 1 END)
             AS recent_events
    FROM events GROUP BY user_id
"""


def agg_two_track_decay(spark, sf_dir):
    """Two-track decayed sums — the decayed-sum popularity aggregate
    (PostingRepository.java:680-690: Σ value·(1 − (age_h/decay_h)²))
    plus the clamped-at-zero fad track (PostingRepository.java:703-715:
    Σ max(value·(1−ratio²·9), 0)).  The popularity column IS the
    single-track decayed sum; the second column adds the clamp.
    Per-row contributions are rounded to integer micro-units before
    summing → exact cross-engine regardless of reduction order."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    ratio = (F.lit(NOW_MS) - F.unix_millis(F.col("ts").cast("timestamp"))) / 3600000.0 \
        / DECAY_HOURS
    pop = F.col("value") * (1.0 - F.pow(ratio, 2))
    fad = F.greatest(F.col("value") * (1.0 - F.pow(ratio, 2) * 9.0),
                     F.lit(0.0))
    return ev.groupBy("user_id").agg(
        F.sum(F.round(pop * 1e6).cast("long")).alias("popularity_e6"),
        F.sum(F.round(fad * 1e6).cast("long")).alias("fad_e6"))


AGG_TWO_TRACK_DECAY_SQL = f"""
    SELECT user_id,
           CAST(sum(CAST(round(value * (1 - power(
             ({NOW_MS} - epoch_ms(ts)) / 3600000.0 / {DECAY_HOURS}, 2))
             * 1e6) AS BIGINT)) AS BIGINT) AS popularity_e6,
           CAST(sum(CAST(round(greatest(value * (1 - power(
             ({NOW_MS} - epoch_ms(ts)) / 3600000.0 / {DECAY_HOURS}, 2) * 9),
             0.0) * 1e6) AS BIGINT)) AS BIGINT) AS fad_e6
    FROM events GROUP BY user_id
"""


def agg_recommendation_order(spark, sf_dir):
    """recommendationOrder = createdAt + tanh((r + 5c + 25·ob)/35)·600000
    — the FULL reference formula (PostingRepository.java:54-62,
    apoc.math.tanh): r = reactions, c = comments (weighted 5×),
    ob = owner-boost flag (weighted 25×).  Mapped as r = lineitems per
    order, c = returned lineitems (l_returnflag='R'), ob = urgent
    priority.  tanh is written as (e^{2x}−1)/(e^{2x}+1) on BOTH
    engines so the doubles are bit-comparable."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(
        F.count("*").alias("r"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("c"))
    ob = F.when(F.col("o_orderpriority").startswith("1"), 1.0) \
        .otherwise(0.0)
    x = (F.col("r") + 5.0 * F.col("c") + 25.0 * ob) / 35.0
    tanh = (F.exp(2.0 * x) - 1.0) / (F.exp(2.0 * x) + 1.0)
    return (
        o.join(counts, o.o_orderkey == counts.l_orderkey)
        .select(F.col("o_orderkey"),
                (F.unix_millis(F.col("o_orderdate").cast("timestamp"))
                 + F.round(tanh * 600000.0).cast("long"))
                .alias("rec_order"))
    )


AGG_RECOMMENDATION_ORDER_SQL = """
    WITH counts AS (
      SELECT l_orderkey, count(*) AS r,
             count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS c
      FROM lineitem GROUP BY l_orderkey)
    SELECT o_orderkey,
           epoch_ms(o_orderdate)
           + CAST(round((exp(2 * (r + 5.0 * c + 25.0 *
                  CASE WHEN o_orderpriority LIKE '1%' THEN 1.0
                       ELSE 0.0 END) / 35.0) - 1)
                        / (exp(2 * (r + 5.0 * c + 25.0 *
                  CASE WHEN o_orderpriority LIKE '1%' THEN 1.0
                       ELSE 0.0 END) / 35.0) + 1) * 600000.0)
                  AS BIGINT) AS rec_order
    FROM orders JOIN counts ON o_orderkey = l_orderkey
"""


def agg_closeness_distance(spark, sf_dir):
    """Closeness: tanh(Σ value·(1−passed²)/100) clamped ≥ 0, distance =
    2 − closeness (reference: scanner/CloseToUpdater.java:66-94,
    base distance 2 for non-friends)."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    passed = (F.lit(NOW_MS) - F.unix_millis(F.col("ts").cast("timestamp"))) / 3600000.0 \
        / (24.0 * 365)
    s = F.sum(F.col("value") * (1.0 - F.pow(passed, 2))).alias("s")
    per_user = ev.groupBy("user_id").agg((s / 100.0).alias("x"))
    tanh = (F.exp(2.0 * F.col("x")) - 1.0) / (F.exp(2.0 * F.col("x")) + 1.0)
    closeness = F.greatest(tanh, F.lit(0.0))
    return per_user.select(
        "user_id",
        F.round(closeness * 1e6).cast("long").alias("closeness_e6"),
        F.round((2.0 - closeness) * 1e6).cast("long").alias("distance_e6"))


AGG_CLOSENESS_DISTANCE_SQL = f"""
    WITH per_user AS (
      SELECT user_id,
             sum(value * (1 - power(({NOW_MS} - epoch_ms(ts))
                 / 3600000.0 / {24.0 * 365}, 2))) / 100.0 AS x
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(round(greatest((exp(2*x)-1)/(exp(2*x)+1), 0.0) * 1e6)
                AS BIGINT) AS closeness_e6,
           CAST(round((2.0 - greatest((exp(2*x)-1)/(exp(2*x)+1), 0.0)) * 1e6)
                AS BIGINT) AS distance_e6
    FROM per_user
"""


def sessionize_gap_batch(spark, sf_dir):
    """Batch twin of ``streaming.stream_sessionize`` — the gap-merge
    expressed as window algebra over the events table, making the
    sessionization SEMANTICS cross-engine-verified in the driver
    scoreboard (the streaming operator itself is pytest-verified with
    DuckDB parity, tests/test_streaming_windowed.py).

    Same half-open [start, last + gap) semantics as the stream (and
    Spark's session_window): a session breaks where ts - lag(ts) >=
    gap.  One shuffle on user_id serves both window passes and the
    final aggregation (Catalyst reuses the hash partitioning); at
    10^12 events this is the standard sort-within-user sessionize.
    tests/test_streaming_windowed.py asserts the stream's emitted
    sessions are exactly this fold filtered to closed-by-watermark."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    gap_us = 86400 * 1_000_000       # 1 day, matching the stream test
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    w = Window.partitionBy("user_id").orderBy("ts")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
           >= gap_us), 1).otherwise(0)
    sid = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ev.withColumn("sid", sid)
            .groupBy("user_id", "sid")
            .agg(F.unix_micros(F.min("ts")).alias("session_start_us"),
                 F.unix_micros(F.max("ts")).alias("session_end_us"),
                 F.count("*").alias("n_events"),
                 (F.round(F.sum("value") * 1e6)).cast("long")
                 .alias("sum_value_e6"))
            .drop("sid"))


SESSIONIZE_GAP_BATCH_SQL = """
    WITH e AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 1 DAY
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e)
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us,
           count(*) AS n_events,
           CAST(round(sum(value) * 1e6) AS BIGINT) AS sum_value_e6
    FROM s GROUP BY user_id, sid
"""


# ------------------------------------------------------- ranking / paging

def rank_keyset_pagination(spark, sf_dir):
    """Keyset ("moment") pagination: before-exclusive bound, DESC order,
    page size — (EntryRepository.java:95-101; cursor slicing
    SearchEntriesController.java:104-118).  moment = epoch millis."""
    from pyspark.sql import functions as F

    before = 1705276800000  # page cursor
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("moment"))
        .filter(F.col("moment") <= before)
        .orderBy(F.desc("moment"), F.asc("event_id")).limit(20)
    )


RANK_KEYSET_PAGINATION_SQL = """
    SELECT event_id, epoch_ms(ts) AS moment FROM events
    WHERE epoch_ms(ts) <= 1705276800000
    ORDER BY moment DESC, event_id LIMIT 20
"""


def rank_moment_allocation(spark, sf_dir):
    """Unique-moment allocation: base = ts·1000 + collision-free nonce
    via row_number over same-ts groups (reference:
    util/MomentFinder.java:10-23 probes until unique; here collision-
    free by construction, SURVEY §2.5)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("ts").orderBy("event_id")
    return ev.select(
        "event_id",
        (F.unix_millis(F.col("ts").cast("timestamp")) * 1000
         + F.row_number().over(w)).alias("moment"))


RANK_MOMENT_ALLOCATION_SQL = """
    SELECT event_id,
           epoch_ms(ts) * 1000
           + row_number() OVER (PARTITION BY ts ORDER BY event_id)
             AS moment
    FROM events
"""


def rank_two_key_ordering(spark, sf_dir):
    """Two-key ordering with coalesce — ORDER BY coalesce(fad,0) DESC,
    popularity DESC (PostingRepository.java:522); also the top-k-by-
    stored-field pattern (PostingRepository.java:494-503 ORDER BY …
    DESC LIMIT) — Spark plans the whole thing as a distributed
    TakeOrderedAndProject, no global sort."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_id", "event_type", "value")
        .orderBy(F.desc(F.coalesce(F.col("value"), F.lit(0.0))),
                 F.desc("event_type"), F.asc("event_id"))
        .limit(50)
    )


RANK_TWO_KEY_ORDERING_SQL = """
    SELECT event_id, event_type, value FROM events
    ORDER BY coalesce(value, 0.0) DESC, event_type DESC, event_id
    LIMIT 50
"""


def rank_offset_stitching(spark, sf_dir):
    """Stratified paging: walk strata in priority order carrying the
    offset remainder (SearchNodesController.java:262-312).

    Scale shape: the page bound is offset+limit = 30, and the global
    order walks whole strata first, so each stratum only ever
    contributes its own top-30 — taken per-stratum with a distributed
    ``TakeOrderedAndProject`` (orderBy+limit).  The single-partition
    row_number window then runs over ≤ 60 rows, never the full table
    (the round-1 plan funneled every stratum row through one task)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    c = _t(spark, sf_dir, "customer")
    bound = 30

    def stratum(segment, tag):
        return (c.filter(F.col("c_mktsegment") == segment)
                .select("c_custkey", "c_name")
                .orderBy("c_name", "c_custkey").limit(bound)
                .withColumn("stratum", F.lit(tag)))

    both = stratum("BUILDING", 1).unionByName(stratum("AUTOMOBILE", 2))
    w = Window.orderBy("stratum", "c_name", "c_custkey")
    return (both.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter((F.col("rank") > 10) & (F.col("rank") <= 30))
            .select("rank", "c_custkey", "stratum"))


RANK_OFFSET_STITCHING_SQL = """
    WITH both_strata AS (
      SELECT c_custkey, c_name, 1 AS stratum FROM customer
      WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey, c_name, 2 AS stratum FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE'),
    ranked AS (
      SELECT c_custkey, stratum,
             row_number() OVER (ORDER BY stratum, c_name, c_custkey)
               AS rank
      FROM both_strata)
    SELECT rank, c_custkey, stratum FROM ranked
    WHERE rank > 10 AND rank <= 30
"""


QUERIES = {
    "filter_term_range_exists":
        (filter_term_range_exists, FILTER_TERM_RANGE_EXISTS_SQL),
    "filter_in_case_coalesce":
        (filter_in_case_coalesce, FILTER_IN_CASE_COALESCE_SQL),
    # filter_prefix_ci / join_fanout_ids left the 50-entry driver
    # window in round 4 (their predicate/join shapes are subsumed by
    # fts_prefix_and and the hydrate join of every fts entry) to make
    # room for the engine serving ops fts_search_many /
    # fts_match_count; both stay DuckDB-verified in
    # tests/test_round4_fixes.py.
    "filter_regex_permutations":
        (filter_regex_permutations, FILTER_REGEX_PERMUTATIONS_SQL),
    # filter_visibility_default was swapped out of the 50-entry driver
    # window for fts_phrase_match (round 4): its coalesce-default
    # predicate shape is fully covered by filter_in_case_coalesce +
    # filter_term_range_exists; it stays DuckDB-parity-tested in
    # tests/test_round4_fixes.py.
    "join_entry_source_owner":
        (join_entry_source_owner, JOIN_ENTRY_SOURCE_OWNER_SQL),
    "join_semi_has_open_order":
        (join_semi_has_open_order, JOIN_SEMI_HAS_OPEN_ORDER_SQL),
    "join_anti_no_orders": (join_anti_no_orders, JOIN_ANTI_NO_ORDERS_SQL),
    "join_left_optional": (join_left_optional, JOIN_LEFT_OPTIONAL_SQL),
    "join_two_hop_distinct":
        (join_two_hop_distinct, JOIN_TWO_HOP_DISTINCT_SQL),
    "agg_count_day_window":
        (agg_count_day_window, AGG_COUNT_DAY_WINDOW_SQL),
    "agg_two_track_decay": (agg_two_track_decay, AGG_TWO_TRACK_DECAY_SQL),
    "agg_recommendation_order":
        (agg_recommendation_order, AGG_RECOMMENDATION_ORDER_SQL),
    "agg_closeness_distance":
        (agg_closeness_distance, AGG_CLOSENESS_DISTANCE_SQL),
    # rank_keyset_pagination left the driver window in round 4 (the
    # identical before-exclusive DESC LIMIT shape is driver-verified
    # by fts_by_hashtag_keyset); its slot went to the sessionize
    # batch twin.  Still DuckDB-verified in tests/test_round4_fixes.py.
    "sessionize_gap_batch":
        (sessionize_gap_batch, SESSIONIZE_GAP_BATCH_SQL),
    "rank_moment_allocation":
        (rank_moment_allocation, RANK_MOMENT_ALLOCATION_SQL),
    "rank_two_key_ordering":
        (rank_two_key_ordering, RANK_TWO_KEY_ORDERING_SQL),
    "rank_offset_stitching":
        (rank_offset_stitching, RANK_OFFSET_STITCHING_SQL),
}

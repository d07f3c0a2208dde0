package graft.queries

import graft.engine.{Semantics, Tables}
import graft.operators.SessionOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream extension queries (X5 JSON extraction, X6 sessionization)
  * plus the multimodal metadata surface (binary columns). */
object Events extends QueryGroup {

  /** X5: JSON property extraction from `events.props` + grouped rollup.
    * get_json_object is a real JSON-path evaluation (F14 class); the bucket
    * keeps the output small and deterministic. */
  private val q28 = QueryDef(
    "q28_json_extract_agg",
    (s, dir) => Tables.events(s, dir)
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy((col("k_val") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("cnt"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("k_bucket")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           |  count(*) AS cnt, round(avg(value), 4) AS avg_value
           |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin))

  /** X6: gap-based sessionization (30 min) — lag gap-flag + running sum,
    * then per-session rollup. Gap arithmetic on raw int64 nanos so both
    * engines compare exactly. */
  private val q29 = QueryDef(
    "q29_sessionize",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      SessionOps.sessionize(ev.withColumn("ts_us", expr("ts_ns div 1000")),
          entity = col("user_id"),
          // integer MICROS with the gap in µs: lag diff exact (no double
          // quantization of absolute epochs), and µs — not raw ns — because
          // the DuckDB oracle's TIMESTAMP resolution is µs, so ordering
          // ties and gap boundaries must be decided at µs on both sides
          timeSec = col("ts_us"),
          orderCols = Seq(col("ts_us"), col("event_id")),
          gapSeconds = 1800.0 * 1e6)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH flagged AS (
           |  SELECT user_id, event_id, epoch_us(ts) AS tus,
           |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           |           OR (epoch_us(ts) - lag(epoch_us(ts)) OVER w) > 1800.0 * 1e6
           |      THEN 1 ELSE 0 END AS new_session
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
           |sessions AS (
           |  SELECT user_id, event_id,
           |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           |  FROM flagged)
           |SELECT user_id, session_id, count(*) AS n_events,
           |  min(event_id) AS first_event, max(event_id) AS last_event
           |FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin))

  /** Multimodal metadata surface: documents' text as an opaque binary
    * payload with typed metadata — byte length, content hash, chunk count.
    * (The decode stage itself is the stubbed MediaCodec in MultimodalOps;
    * this query is the schema/metadata plumbing that IS oracle-checkable.) */
  private val q30 = QueryDef(
    "q30_multimodal_meta",
    (s, dir) => Tables.documents(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_hash"),
        (floor(octet_length(col("payload")) / lit(256)) + 1).cast("long").as("n_chunks"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
           |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           |  md5(text) AS content_hash,
           |  octet_length(CAST(text AS BLOB)) // 256 + 1 AS n_chunks
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** W4: value-RANGE window frame — per-event trailing-hour event count and
    * max value per user. RANGE frames are defined by the ORDER-BY VALUE
    * interval (not row position), so output is deterministic under ordering
    * ties without tie-break keys; the frame bound is exact integer µs on
    * both engines, and the aggregates (count, max) are reassociation-proof,
    * so no float-summation-order divergence can bite the hash. */
  private val q58 = QueryDef(
    "q58_rolling_window_range",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          Semantics.roundz(max(col("value")).over(w), 6).as("max_1h"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
           |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
           |  round(max(value) OVER w, 6) + 0.0 AS max_1h
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
           |ORDER BY event_id""".stripMargin))

  /** J3: explicit LEFT SEMI join — clickers who also purchased. Semi join
    * is the existence-probe join shape (no fan-out, right side reduced to a
    * membership set); completes the join-type surface next to inner (J1),
    * anti (J2), as-of (q42) and range (q43). */
  private val q59 = QueryDef(
    "q59_semi_join_purchasers",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "click").select(col("user_id")).distinct()
        .join(ev.filter(col("event_type") === "purchase").select(col("user_id")),
          Seq("user_id"), "left_semi")
        .orderBy(col("user_id"))
    },
    Some("""SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
           |  AND user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
           |ORDER BY user_id""".stripMargin))

  /** X6 cohort retention: users bucketed by first-active date, distinct
    * actives per (cohort, day offset) — the retention triangle. Joins ship
    * (user, date) pairs only; output is cohorts × offsets at any scale. */
  private val q86 = QueryDef(
    "q86_cohort_retention",
    (s, dir) => SessionOps.cohortRetention(
        Tables.events(s, dir), col("user_id"), to_date(col("ts")))
      .orderBy(col("cohort_date"), col("day_offset")),
    Some("""WITH act AS (SELECT DISTINCT user_id AS u,
           |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
           |c AS (SELECT u, min(d) AS cohort_date FROM act GROUP BY 1)
           |SELECT c.cohort_date, CAST(a.d - c.cohort_date AS BIGINT) AS day_offset,
           |  count(DISTINCT a.u) AS n_users
           |FROM act a JOIN c USING (u)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** X6 ordered funnel: users who did view → click → purchase in strict
    * time order (µs-exact comparisons; first qualifying occurrence per
    * stage). Stage frames carry (user, t) only. */
  private val q87 = QueryDef(
    "q87_funnel_conversion",
    (s, dir) => SessionOps.funnel(
        Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000")),
        col("user_id"), col("ts_us"), col("event_type"),
        Seq("view", "click", "purchase"))
      .orderBy(col("stage")),
    Some("""WITH e AS (SELECT user_id AS u, event_type AS st, epoch_us(ts) AS tv FROM events),
           |s1 AS (SELECT u, min(tv) AS t FROM e WHERE st = 'view' GROUP BY 1),
           |s2 AS (SELECT e.u, min(e.tv) AS t FROM e JOIN s1 ON e.u = s1.u
           |  WHERE e.st = 'click' AND e.tv > s1.t GROUP BY 1),
           |s3 AS (SELECT e.u, min(e.tv) AS t FROM e JOIN s2 ON e.u = s2.u
           |  WHERE e.st = 'purchase' AND e.tv > s2.t GROUP BY 1)
           |SELECT 1::BIGINT AS stage, 'view' AS step, count(*) AS n_users FROM s1
           |UNION ALL
           |SELECT 2::BIGINT, 'click', count(*) FROM s2
           |UNION ALL
           |SELECT 3::BIGINT, 'purchase', count(*) FROM s3
           |ORDER BY stage""".stripMargin))

  /** O4 grouped: per-group top-k as a MERGEABLE aggregate
    * ([[graft.functions.TopK]]) instead of the window-rank plan — the
    * window form shuffles EVERY row to its group then sorts whole groups;
    * the aggregate's k-bounded buffer combines map-side so only ≤ k rows
    * per group per partition cross the exchange. Deterministic under any
    * partitioning via the (value DESC, event_id ASC) total order; the
    * oracle runs the window form, proving plan-shape equivalence. NULL
    * values filtered on both sides (SQL top-k skips them). */
  private val q166 = QueryDef(
    "q166_grouped_topk",
    (s, dir) => {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      val fn = udaf(new graft.functions.TopK(3),
        ExpressionEncoder[(Double, Long)]())
      Tables.events(s, dir).filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(fn(col("value"), col("event_id")).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("r0", "e")))
        .select(col("event_type"), (col("r0") + 1).cast("long").as("rank"),
          col("e._1").as("value"), col("e._2").as("event_id"))
        .orderBy(col("event_type"), col("rank"))
    },
    Some("""SELECT event_type, CAST(rk AS BIGINT) AS rank, value, event_id
           |FROM (
           |  SELECT event_type, value, event_id,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value DESC, event_id) AS rk
           |  FROM events WHERE value IS NOT NULL)
           |WHERE rk <= 3 ORDER BY event_type, rank""".stripMargin))

  override val defs: Seq[QueryDef] =
    Seq(q28, q29, q30, q58, q59, q86, q87, q166)
}

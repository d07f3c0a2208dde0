package graft.queries

import graft.engine.Tables
import graft.operators.EtlOps
import org.apache.spark.sql.functions._

/** Oracle-checked instantiations of the ETL operators (SURVEY §2.5, W1-W3;
  * §2.8 F6/F7; §2.3 J2) over the `events` fixture per FIXTURES.md: `value`
  * plays METERS, `ts` plays ACT_TIME, `user_id` plays trip_id.
  */
object Etl extends QueryGroup {

  /** W1+W2 (transform.py:204-259): per-entity lag-difference derivative with
    * first-row backfill. Time basis is exact integer MICROS on both sides —
    * Δ computed on integers before the double divide, and µs (not raw ns)
    * because DuckDB's TIMESTAMP sees only µs: ns-resolution ordering or
    * deltas would tie-break and quantize differently across engines. */
  private val q14 = QueryDef(
    "q14_speed_derivation",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
      EtlOps.deriveSpeed(ev,
          partitionCol = col("user_id"),
          orderCols = Seq(col("ts_us"), col("event_id")),
          meters = col("value"),
          timeSec = col("ts_us"), // integer µs: Δ is exact
          dtToSeconds = d => d.cast("double") / 1e6)
        .select(col("event_id"), col("user_id"),
          graft.engine.Semantics.roundz(col("speed"), 6).as("speed"))
        .orderBy(col("event_id"))
    },
    Some("""WITH speeds AS (
           |  SELECT event_id, user_id,
           |    CASE WHEN (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6 > 0
           |      THEN (value - lag(value) OVER w) / ((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6)
           |    END AS speed_raw,
           |    row_number() OVER w AS rn
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           |)
           |SELECT event_id, user_id,
           |  round(CASE WHEN rn = 1 THEN lead(speed_raw) OVER w2 ELSE speed_raw END, 6) + 0.0 AS speed
           |FROM speeds
           |WINDOW w2 AS (PARTITION BY user_id ORDER BY rn)
           |ORDER BY event_id""".stripMargin))

  /** F6+F7 (transform.py:25-59): round-trip the reference's timestamp
    * synthesis — format each event date as the reference's "05JAN2024" OPD
    * string, take seconds-since-midnight + 86400 (forcing the >24 h service-
    * day rollover path), parse the string back via substring+month-map and
    * add the interval. synth_ts must land exactly one day after the original
    * second-truncated timestamp. */
  private val q15 = QueryDef(
    "q15_timestamp_synthesis",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("opd_date",
          concat(upper(date_format(col("ts"), "ddMMMyyyy")), lit(":00:00:00")))
        .withColumn("act_time", (unix_timestamp(col("ts")) % 86400) + 86400)
      ev.withColumn("synth_ts",
          EtlOps.synthesizeTimestamp(EtlOps.parseOpdDate(col("opd_date")), col("act_time")))
        .select(col("event_id"), col("opd_date"), col("act_time"),
          col("synth_ts"), to_date(col("synth_ts")).as("rolled_date"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
           |  upper(strftime(CAST(ts AS TIMESTAMP), '%d%b%Y')) || ':00:00:00' AS opd_date,
           |  epoch_us(CAST(ts AS TIMESTAMP))//1000000 % 86400 + 86400 AS act_time,
           |  CAST(CAST(ts AS DATE) AS TIMESTAMP)
           |    + to_seconds(epoch_us(CAST(ts AS TIMESTAMP))//1000000 % 86400 + 86400) AS synth_ts,
           |  CAST(CAST(CAST(ts AS DATE) AS TIMESTAMP)
           |    + to_seconds(epoch_us(CAST(ts AS TIMESTAMP))//1000000 % 86400 + 86400) AS DATE) AS rolled_date
           |FROM events ORDER BY event_id""".stripMargin))

  /** J2 (transform.py:190-195): ON-CONFLICT-DO-NOTHING upsert as a left-anti
    * join — incoming signups whose user already has an error event on the
    * first day are dropped; the rest would be appended. */
  private val q16 = QueryDef(
    "q16_upsert_anti_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val incoming = ev.filter(col("event_type") === "signup")
      val existing = ev.filter(col("event_type") === "error" &&
        graft.engine.Semantics.onDate(col("ts"), "2024-01-01"))
      EtlOps.upsertNewKeys(incoming, existing, Seq("user_id"))
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id FROM events e
           |WHERE event_type = 'signup' AND NOT EXISTS (
           |  SELECT 1 FROM events x
           |  WHERE x.user_id = e.user_id AND x.event_type = 'error'
           |    AND CAST(x.ts AS DATE) = DATE '2024-01-01')
           |ORDER BY event_id""".stripMargin))

  /** AS-OF join (builder prompt's operator-Spark-lacks example): every
    * 'click' event matched to the user's latest 'signup' at-or-before it.
    * union+window implementation — one key shuffle, no per-key cross
    * product; DuckDB's native ASOF LEFT JOIN is the oracle. Right side
    * deduped to one row per (user, µs) so the carried row is well-defined
    * in both engines. */
  private val q42 = QueryDef(
    "q42_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts_us").as("signup_us"))
        .agg(max(col("event_id")).as("signup_event"))
      graft.operators.JoinOps.asofJoinBackward(
          clicks, signups, key = "user_id",
          leftTime = "ts_us", rightTime = "signup_us", payload = Seq("signup_event"))
        .select(col("event_id"), col("user_id"), col("signup_event_asof").as("signup_event"))
        .orderBy(col("event_id"))
    },
    Some("""WITH clicks AS (
           |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
           |signups AS (
           |  SELECT user_id, epoch_us(ts) AS signup_us, max(event_id) AS signup_event
           |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
           |SELECT c.event_id, c.user_id, s.signup_event
           |FROM clicks c ASOF LEFT JOIN signups s
           |  ON c.user_id = s.user_id AND c.ts_us >= s.signup_us
           |ORDER BY c.event_id""".stripMargin))

  /** Range join, bucket-bounded (the other operator-Spark-lacks example):
    * per click, the count of the same user's 'error' events in the next
    * hour (the fixture's event stream is sparse at minute scale). Candidates join on (user, span-bucket) — never a per-key cross
    * product; the exact window filter runs on the bounded set. */
  private val q43 = QueryDef(
    "q43_range_join",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us").as("err_us"))
      graft.operators.JoinOps.rangeJoinByBucket(
          clicks, errors, key = "user_id",
          leftTime = "ts_us", rightTime = "err_us", lo = 1L, hi = 3600L * 1000000L)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_errors_1h"))
        .orderBy(col("event_id"))
    },
    Some("""WITH clicks AS (
           |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
           |errors AS (
           |  SELECT user_id, epoch_us(ts) AS err_us FROM events WHERE event_type = 'error')
           |SELECT c.event_id, count(*) AS n_errors_1h
           |FROM clicks c JOIN errors e
           |  ON c.user_id = e.user_id
           |  AND e.err_us >= c.ts_us + 1 AND e.err_us <= c.ts_us + 3600::BIGINT * 1000000
           |GROUP BY 1 ORDER BY event_id""".stripMargin))

  /** J1 at the size tier ABOVE broadcast ([[JoinOps.bloomReducedJoin]]):
    * fact⋈dim where the dim's rows wouldn't fit a broadcast build table
    * but its key SET compresses into a literal Bloom sketch — the dim's
    * distinct keys fold distributed into the sketch, the fact scan keeps
    * only bloom-positive rows, and the exact join runs on the reduced
    * slice. No false negatives, so the result is bit-equal to the plain
    * inner join the oracle runs; what changes is the exchange: at 100 TB
    * only (true matches + ε·2^−k) of the fact table enters the join
    * shuffle instead of all of it. The explicit, measured-sizing form of
    * Spark's own `InjectRuntimeFilter` rewrite.
    *
    * The sum casts l_quantity to long PER-ROW before summing:
    * integer-exact and order-independent, where a double sum's low bits
    * depend on shuffle order. Fixture l_quantity is integral 1..50, so
    * Spark's truncate-cast and DuckDB's round-cast agree. */
  private val q161 = QueryDef(
    "q161_bloom_reduced_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val dim = Tables.part(s, dir).filter(col("p_size") <= 2)
        .select(col("p_partkey"), col("p_brand"))
      graft.operators.JoinOps.bloomReducedJoin(li, "l_partkey", dim, "p_partkey")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n_lines,
           |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE p_size <= 2
           |GROUP BY 1 ORDER BY p_brand""".stripMargin))

  /** J2 versioned: SCD Type-2 dimension merge ([[EtlOps.scd2Apply]]) — one
    * update batch against a standing `customer` dimension that already has
    * history (every key≡0 mod 4 carries a closed 2018→2020 version). The
    * batch derives three disjoint populations from the same table so every
    * merge branch is exercised and the oracle stays self-contained:
    * key≡0 mod 3 changes `bal` (close + reopen), key≡1 mod 3 re-sends
    * identical values (no-op), keys +1,000,000 are first-seen inserts.
    * `bal` arithmetic is a single IEEE double addition — deterministic
    * cross-engine with no rounding step. */
  private val q122 = QueryDef(
    "q122_scd2_merge",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val cur = c.select(col("c_custkey"), col("c_mktsegment").as("segment"),
        col("c_acctbal").as("bal"),
        to_date(lit("2020-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"))
      val hist = c.filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          (col("c_acctbal") - lit(50.0)).as("bal"),
          to_date(lit("2018-01-01")).as("valid_from"),
          to_date(lit("2020-01-01")).as("valid_to"))
      val upd = c.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            (col("c_acctbal") + lit(100.5)).as("bal"))
        .unionByName(c.filter(col("c_custkey") % 3 === 1)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            col("c_acctbal").as("bal")))
        .unionByName(c.filter(col("c_custkey") % 10 === 7)
          .select((col("c_custkey") + lit(1000000L)).as("c_custkey"),
            lit("NEW").as("segment"), lit(0.0).as("bal")))
      EtlOps.scd2Apply(hist.unionByName(cur), upd,
          keys = Seq("c_custkey"), tracked = Seq("segment", "bal"),
          effective = to_date(lit("2023-06-01")))
        .orderBy(col("c_custkey"), col("valid_from"))
    },
    Some("""WITH cur AS (
           |  SELECT c_custkey, c_mktsegment AS segment, c_acctbal AS bal,
           |    DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
           |  FROM customer),
           |hist AS (
           |  SELECT c_custkey, c_mktsegment AS segment, c_acctbal - 50.0 AS bal,
           |    DATE '2018-01-01' AS valid_from, DATE '2020-01-01' AS valid_to
           |  FROM customer WHERE c_custkey % 4 = 0),
           |upd AS (
           |  SELECT c_custkey, c_mktsegment AS segment, c_acctbal + 100.5 AS bal
           |  FROM customer WHERE c_custkey % 3 = 0
           |  UNION ALL
           |  SELECT c_custkey, c_mktsegment, c_acctbal
           |  FROM customer WHERE c_custkey % 3 = 1
           |  UNION ALL
           |  SELECT c_custkey + 1000000, 'NEW', CAST(0.0 AS DOUBLE)
           |  FROM customer WHERE c_custkey % 10 = 7),
           |j AS (
           |  SELECT coalesce(c.c_custkey, u.c_custkey) AS k,
           |    c.segment AS cs, c.bal AS cb, c.valid_from AS cvf,
           |    u.segment AS us, u.bal AS ub,
           |    c.c_custkey IS NOT NULL AS has_c, u.c_custkey IS NOT NULL AS has_u,
           |    (c.c_custkey IS NOT NULL AND u.c_custkey IS NOT NULL AND
           |     (c.segment IS DISTINCT FROM u.segment
           |      OR c.bal IS DISTINCT FROM u.bal)) AS chg
           |  FROM cur c FULL JOIN upd u ON c.c_custkey = u.c_custkey),
           |sel AS (
           |  SELECT c_custkey AS k, segment, bal, valid_from, valid_to FROM hist
           |  UNION ALL
           |  SELECT k, cs, cb, cvf,
           |    CASE WHEN chg THEN DATE '2023-06-01' END
           |  FROM j WHERE has_c
           |  UNION ALL
           |  SELECT k, us, ub, DATE '2023-06-01', CAST(NULL AS DATE)
           |  FROM j WHERE has_u AND (NOT has_c OR chg))
           |SELECT k AS c_custkey, segment, bal, valid_from, valid_to
           |FROM sel ORDER BY c_custkey, valid_from""".stripMargin))

  /** Incremental summary-table maintenance ([[EtlOps.rollupState]] +
    * [[EtlOps.mergeRollup]]): the insert-only materialized-view refresh —
    * a standing per-type rollup (count/sum/min/max, a commutative monoid)
    * absorbs a fresh batch's PARTIAL state without rescanning history,
    * and the oracle proves merge ≡ full recompute by running the full
    * GROUP BY over everything. Float sums re-associate across partials,
    * so the query rounds at OUTPUT (house round-4), never in state; AVG
    * would be derived sum/n, COUNT(DISTINCT) needs the HLL register
    * state (q136) — neither is storable-mergeable directly. */
  private val q165 = QueryDef(
    "q165_incremental_rollup",
    (s, dir) => {
      // Sum in integer cents (value carries exactly ≤2 decimals): a DOUBLE
      // sum over an event_type group grows with the tier and its
      // order-dependent error crossed the round-4 guard at sf10 (q40's
      // measured fork — this query has the same shape and only agreed by
      // addition-order luck). round(v*100)/100.0 is bit-identical to v
      // for 2-decimal doubles, so min/max in cents lose nothing.
      val ev = Tables.events(s, dir)
        .withColumn("__cents", round(col("value") * 100).cast("long"))
      val standing = EtlOps.rollupState(
        ev.filter(col("event_id") % 10 < 8), Seq("event_type"), col("__cents"))
      val batch = EtlOps.rollupState(
        ev.filter(col("event_id") % 10 >= 8), Seq("event_type"), col("__cents"))
      EtlOps.mergeRollup(standing, batch, Seq("event_type"))
        .select(col("event_type"), col("n_rows"),
          (col("sum_v") / 100.0).as("sum_value"),
          (col("min_v") / 100.0).as("min_value"),
          (col("max_v") / 100.0).as("max_value"))
        .orderBy(col("event_type"))
    },
    // min/max go through the SAME integer-cents round-trip as the engine
    // (round-12 advice): `min(value)` raw would be bit-identical only under
    // the unasserted assumption that events.value carries ≤2 decimals — a
    // future tier with more precision would surface as a spurious q165 FAIL
    // costing a diagnosis round. Symmetric cents on both sides makes the
    // check compare the function actually computed.
    Some("""SELECT event_type, count(value) AS n_rows,
           |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
           |  min(CAST(round(value * 100) AS BIGINT)) / 100.0 AS min_value,
           |  max(CAST(round(value * 100) AS BIGINT)) / 100.0 AS max_value
           |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))

  override val defs: Seq[QueryDef] =
    Seq(q14, q15, q16, q42, q43, q122, q161, q165)
}

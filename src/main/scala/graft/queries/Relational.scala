package graft.queries

import graft.engine.{Semantics, Tables}
import org.apache.spark.sql.functions._

/** The reference's 13-query analytic surface (/root/reference/analytic.sql:1-191)
  * re-hosted onto the testdata fixtures per FIXTURES.md: BreadCrumb fact →
  * `events`/`lineitem`, Trip dim → `orders`. Pure Catalyst — every query is a
  * declarative DataFrame plan; pushdown/pruning/broadcast come from the
  * optimizer, not hand-scheduling.
  */
object Relational extends QueryGroup {

  /** Q1/Q2 (analytic.sql:2-9): COUNT(*) filtered to one event-date.
    * P2 date-equality filter + A1 ungrouped count. The to_date cast filter
    * compiles to a parquet-pushable range predicate on ts. */
  private val q01 = QueryDef(
    "q01_count_on_date",
    (s, dir) => Tables.events(s, dir)
      .filter(to_date(col("ts")) === lit("2024-01-05"))
      .agg(count(lit(1)).as("cnt")),
    Some("SELECT count(*) AS cnt FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'"))

  override val defs: Seq[QueryDef] = Seq(q01)
}

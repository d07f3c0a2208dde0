package graft

/** Plan-shape regression gate over the ENTIRE query surface.
  *
  * Correctness is gated per-query by the DuckDB oracle; this spec gates the
  * property the oracle can't see: the PLAN. At 100 TB the difference between
  * a broadcast nested-loop against a 1-row aggregate and a true cartesian
  * product is the difference between a scan and a job that never finishes —
  * and a refactor can flip one into the other without changing a single
  * result row at test scale. Building every registered query against the
  * sf0.001 tables and walking its physical plan catches that class of
  * regression at test time instead of at bench (or cluster) time.
  *
  * The audit is deliberately conservative: `CartesianProductExec` is never
  * acceptable (every intentional cross join in the library broadcasts a
  * bounded side, which plans as BroadcastNestedLoopJoin instead), so there
  * is no allowlist to rot.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("query ledger matches the documented surface (139 queries, 136 oracles)") {
    assert(SparkEntry.queries.size >= 139,
      s"query surface shrank: ${SparkEntry.queries.size} < 139")
    assert(SparkEntry.oracleSql.size >= 136,
      s"oracle surface shrank: ${SparkEntry.oracleSql.size} < 136")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.mkString(", ")}")
  }

  test("no query plans an UNPARTITIONED window over unbounded input") {
    // A Window with an empty partitionSpec funnels its whole input through
    // ONE task — the straggler shuffleRank/groupedTokenPrefixSum exist to
    // avoid. The surface plans ZERO of them (every ranking/cumsum rides a
    // bucketed construction or a per-group window), so like the cartesian
    // audit there is no allowlist to rot.
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val plan = build(spark, dir).queryExecution.executedPlan
        val global = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        if (global.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned window planned by: ${offenders.mkString(", ")} — " +
        "range-bucket the key space (shuffleRank pattern) instead")
  }

  test("no query plans a CartesianProduct") {
    // Trainer queries execute their (bounded, driver-state) iteration during
    // construction; at sf0.001 that is cheap and it means the plan inspected
    // here is exactly the one the driver's Verify/Bench run executes.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val plan = build(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian product planned by: ${offenders.mkString(", ")} — " +
        "broadcast the bounded side (or bound it) instead")
  }
}

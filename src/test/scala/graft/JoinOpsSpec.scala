package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoinBackward matches latest at-or-before right row, null when none") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 50L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 15L, 901L), (2L, 6L, 902L))
      .toDF("k", "rt", "rv")
    val got = JoinOps.asofJoinBackward(left, right, "k", "t", "rt", Seq("rv"))
      .select(col("lid"), col("rv_asof")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(100L) === Some(900L)) // equal time is inclusive
    assert(got(101L) === Some(901L)) // latest of two predecessors
    assert(got(102L) === None) // right row is in the future
    assert(got(103L) === None) // no right rows for key 3
    assert(got.size === 4) // left-outer: row count preserved
  }

  test("asofJoinBackward returns the MATCHED row's null payload, not an older non-null one") {
    // DuckDB ASOF LEFT JOIN semantics: the latest at-or-before right row is
    // the match even when its payload value is NULL — a per-column
    // last(ignoreNulls) would wrongly carry the older 900 forward.
    val left = Seq((1L, 20L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, Some(900L)), (1L, 15L, None))
      .toDF("k", "rt", "rv")
    val got = JoinOps.asofJoinBackward(left, right, "k", "t", "rt", Seq("rv"))
      .select(col("lid"), col("rv_asof")).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 100L)
    assert(got(0).isNullAt(1), "matched row's null payload must propagate")
  }

  test("rangeJoinByBucket equals the naive range join across bucket boundaries") {
    val left = (0L until 50L).map(i => (i % 3, i * 7L, i)).toDF("k", "t", "lid")
    val right = (0L until 80L).map(j => (j % 3, j * 5L + 2L, j)).toDF("k", "rt", "rid")
    val (lo, hi) = (1L, 40L)
    val bucketed = JoinOps.rangeJoinByBucket(left, right, "k", "t", "rt", lo, hi)
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right, Seq("k"))
      .filter(col("rt") >= col("t") + lo && col("rt") <= col("t") + hi)
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }
}

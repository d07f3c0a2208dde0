package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Connected components is the cluster-resolution step behind near-dup
  * dedup: pairs → components → one keeper per component. The invariants
  * that matter: correct labels on chains (worst-case diameter), component
  * separation, indifference to edge direction/multiplicity/partitioning,
  * and a sane empty-input result. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] =
    GraphOps.connectedComponents(
      edges.toDF("src", "dst").repartition(parts), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to the min id (diameter = n rounds)") {
    val got = comps((1L to 12L).sliding(2).map(p => (p.head, p.last)).toSeq)
    assert(got === (1L to 12L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep distinct min labels") {
    val got = comps(Seq((5L, 2L), (2L, 9L), (30L, 40L), (41L, 40L), (100L, 100L)))
    assert(got === Map(2L -> 2L, 5L -> 2L, 9L -> 2L,
      30L -> 30L, 40L -> 30L, 41L -> 30L, 100L -> 100L))
  }

  test("edge direction and duplicate edges do not change the labeling") {
    val base = comps(Seq((1L, 2L), (2L, 3L)))
    val noisy = comps(Seq((2L, 1L), (3L, 2L), (1L, 2L), (1L, 2L), (2L, 3L)))
    assert(noisy === base)
  }

  test("labeling is invariant to input partitioning") {
    val edges = (1L to 50L).map(i => (i, i % 7 + 1000L))
    assert(comps(edges, parts = 1) === comps(edges, parts = 13))
  }

  test("empty edge list yields an empty labeling, not a crash") {
    assert(comps(Seq.empty) === Map.empty[Long, Long])
  }

  test("clusterKeepers reports one row per component with its size") {
    val cc = GraphOps.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("src", "dst"), "src", "dst")
    val got = GraphOps.clusterKeepers(cc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 7L -> 2L))
  }

  test("repeated invocations do not accumulate iteration caches") {
    // Each call persists e + und + one localCheckpoint per round (~12 RDDs
    // for this graph); all but the checkpointed result must be released on
    // return. The count is SparkContext-global and other suites run
    // concurrently against the shared session, so the bound is loose:
    // 5 calls of a LEAKING loop add ≥ 50 persistent RDDs, 5 clean calls
    // add ≤ 5 results (until GC) + concurrent-suite noise.
    comps(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 5).foreach(_ => comps(Seq((1L, 2L), (2L, 3L), (3L, 4L))))
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before < 25, s"persistent RDDs grew $before -> $after over 5 calls")
  }
}

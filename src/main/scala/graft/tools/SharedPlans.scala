package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Dev tool (r16): dump the RAW plans of the session-shared pipeline
  * builds — the exact DataFrames [[graft.queries.SharedPipelines]] passes to
  * `Shared.cached`, reconstructed WITHOUT the cache wrapper so the full
  * lineage is visible instead of a checkpoint scan. The shared builds are
  * the most expensive bench rows (`shared_calib_candidates` 8-24 s across
  * tiers) but are not in `SparkEntry.queries`, so PlanDump can't reach them.
  *
  * Usage: `sbt "runMain graft.tools.SharedPlans [sfDir] [name ...]"`;
  * names: calib_candidates, calib_pairs, semantic_edges.
  * GRAFT_EXEC=1 runs each (noop count) and prints the post-AQE executed
  * plan — the only view that shows ReusedExchange.
  */
object SharedPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wanted = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "1m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exec = sys.env.get("GRAFT_EXEC").contains("1")
    val builds = SharedPlansRef.builds(spark, dir)
    val names = if (wanted.nonEmpty) wanted.toSeq.sorted else builds.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== shared:$n ==========")
      val df = builds(n)()
      if (exec) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}

/** The un-cached shared-build DataFrames, shared between [[SharedPlans]]
  * (plan dumps) and [[graft.TimeQ]]'s `shared:` mode (timing). */
object SharedPlansRef {
  def builds(spark: SparkSession, dir: String): Map[String, () => DataFrame] = {
    import graft.engine.Tables
    import graft.operators.{DedupOps, GraphOps, SimilarityOps}
    import graft.queries.SharedPipelines
    def semanticEdges(): DataFrame = DedupOps.embeddingNearDupsTables(
      Tables.embeddings(spark, dir), "vec_id",
      col("embedding"), col("label"), SharedPipelines.semPairThreshold,
      SimilarityOps.lshTables(SharedPipelines.semTables,
        SharedPipelines.tunedSemanticDepth(spark, dir), 64))
    Map(
      "calib_candidates" -> (() => DedupOps.nearDupCandidates(
        SharedPipelines.calibratedShingleRows(spark, dir))),
      "calib_pairs" -> (() => DedupOps.jaccardVerifyPairs(
        DedupOps.nearDupCandidates(SharedPipelines.calibratedShingleRows(spark, dir)),
        SharedPipelines.calibratedShingleRows(spark, dir), 0.5)),
      "semantic_edges" -> (() => semanticEdges()),
      "semantic_cc" -> (() => GraphOps.connectedComponents(
        semanticEdges(), "a_id", "b_id")))
  }
}

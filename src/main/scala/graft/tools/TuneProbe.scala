package graft.tools

import graft.engine.Tables
import graft.operators.SimilarityOps
import graft.queries.SharedPipelines
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrument: print the semantic pair-geometry sweep table
  * ([[SimilarityOps.pairLshAutoTune]]) for a data tier — per config the
  * measured pair recall on the sampled truth pairs, the exact bucket pair
  * mass, and the chosen flag. The table the q61/q110 oracle replays; run it
  * per tier to see where the corpus walks the geometry.
  * Usage: sbt "runMain graft.tools.TuneProbe /root/testdata/sf0.1"
  */
object TuneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    println(s"embeddings: ${emb.count()} rows at $dir")
    val t0 = System.nanoTime()
    SimilarityOps.pairLshAutoTune(emb, "vec_id", col("embedding"),
        col("label"), SharedPipelines.semPairThreshold,
        SharedPipelines.semSweepConfigs, dim = 64,
        recallTarget = SharedPipelines.semPairRecallTarget,
        sampleN = SharedPipelines.semPairSampleN)
      .orderBy(col("cfg")).show(30, truncate = false)
    println(f"[tune-probe] sweep wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{DedupOps, TextOps}

/** Throwaway stage-by-stage profile of q65's pipeline at one SF dir.
  * Round 12 re-anchored q65 onto the calibrated generator
  * ([[graft.queries.SharedPipelines.calibratedCandidates]]); this profiles
  * BOTH pools so the re-anchoring's verify-cost delta stays measurable. */
object ProfileQ65 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("COALESCE", "true"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val docs = Tables.documents(spark, dir)

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val shingles = TextOps.shingleRows(docs, col("doc_id"), col("source"), col("text"))
    val cands = DedupOps.minhashLshCandidatesFromRows(shingles, 8, maxDf = 50)
    time("fixedcap-candidates-count")(println("n=" + cands.count()))
    val pinned = cands.localCheckpoint()
    time("fixedcap-pin")(println("n=" + pinned.count()))
    time("fixedcap-verify-from-pinned") {
      println("n=" + DedupOps.editDistanceVerify(docs, "doc_id", col("text"), pinned, 320).count())
    }
    val calib = graft.queries.SharedPipelines.calibratedCandidates(spark, dir)
    time("calibrated-candidates-build")(println("n=" + calib.count()))
    time("calibrated-verify (q65 production path)") {
      println("n=" + DedupOps.editDistanceVerify(docs, "doc_id", col("text"), calib, 320).count())
    }
    spark.stop()
  }
}

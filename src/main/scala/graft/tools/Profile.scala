package graft.tools

import graft.engine.Tables
import graft.operators.{DedupOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage-by-stage timing of the bench hotspots.
  * Usage: sbt "runMain graft.tools.Profile /root/testdata/sf0.1"
  */
object Profile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir)
    t("docs.count")(docs.count())

    val sh = docs.withColumn("shset", array_distinct(TextOps.shingles3(TextOps.tokenize(col("text")))))
    t("shingles materialize")(sh.select(col("doc_id"), size(col("shset"))).count())

    val sets = sh.select(col("doc_id"), col("source").as("bucket"), col("shset"))
      .filter(size(col("shset")) > 0)
    val ex = sets.select(col("doc_id"), col("bucket"), explode(col("shset")).as("sh"))
    t("explode shingles")(ex.count())

    val common = ex.toDF("a_id", "bucket", "sh")
      .join(ex.toDF("b_id", "bucket", "sh"), Seq("bucket", "sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_common"))
    t("common pairs")(common.count())

    t("q22 full")(graft.queries.Dedup.defs.find(_.name == "q22_ngram_jaccard_topk").get
      .spark(spark, dir).count())

    val sigs = sets.select(col("doc_id"), col("bucket"),
      DedupOps.minhashSignature(col("shset"), 8).as("sig"))
    t("minhash signatures (old)")(sigs.select(col("doc_id"), element_at(col("sig"), 1)).count())

    t("q23 full (old)")(graft.queries.Dedup.defs.find(_.name == "q23_minhash_lsh_pairs").get
      .spark(spark, dir).count())

    spark.stop()
  }
}

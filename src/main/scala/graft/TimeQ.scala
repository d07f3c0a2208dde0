package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic: time named queries twice in one warm session at sf0.1 —
  * separates cold codegen/JIT cost (run1 − run2) from steady-state compute
  * (run2). Usage: `sbt "runMain graft.TimeQ q22_ngram_jaccard_topk ..."` */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Untimed warmup; tolerant of partial tiers (target/sf1 carries only
    // documents+embeddings).
    try SparkEntry.queries("q02_count_all")(spark, dir).count()
    catch { case _: Throwable => () }
    for (n <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"TIME $n run$i ${(System.nanoTime()-t0)/1e9}%.3f")
      // Same untimed between-run hygiene as Bench, so isolated TimeQ
      // numbers and in-bench numbers measure the same thing.
      graft.engine.Hygiene.sweep(spark)
    }
    spark.stop()
  }
}

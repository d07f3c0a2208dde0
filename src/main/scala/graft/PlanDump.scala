package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic: print the formatted physical plan of named `SparkEntry`
  * queries (at sf0.01) — the `.explain("formatted")` audit loop.
  * Usage: `sbt "runMain graft.PlanDump q46_source_quota q50_decontamination"`.
  * Set GRAFT_EXEC=1 to RUN each query first and print the post-AQE executed
  * plan instead — the only view that shows runtime decisions like
  * ReusedExchange / skew-join splits / coalesced partitions. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exec = sys.env.get("GRAFT_EXEC").contains("1")
    for (n <- args) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      if (exec) {
        // collect() drives THIS df's QueryExecution (count() would build a
        // different one), so the printed adaptive plan is the final one.
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}

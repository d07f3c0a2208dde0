package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic: print the formatted physical plan of named `SparkEntry`
  * queries (at sf0.01) — the `.explain("formatted")` audit loop.
  * Usage: `sbt "runMain graft.PlanDump q46_source_quota q50_decontamination"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries so the
  * scan/shuffle/join strategy can be audited (pushdown reaching parquet,
  * broadcast joins where a side is small, TakeOrderedAndProject for top-k,
  * WholeStageCodegen span width).
  *
  * Usage: sbt "runMain graft.tools.Plans [sfDir] [queryName ...]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wanted = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (wanted.nonEmpty) wanted.toSeq.sorted
      else Seq("q01_count_on_date", "q05_join_dow_filter", "q08_longest_span_top1",
        "q11_top5_users_by_avg", "q13_dim_extract_first_event", "q22_ngram_jaccard_topk",
        "q23_minhash_lsh_pairs", "q25_cosine_topk_brute", "q29_sessionize")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for the writeShards order contract (round 9): the
  * within-shard `sortWithinPartitions(shard, rank)` added to deliver the
  * docstring's streaming-order promise must not change the write's cost
  * class — the sort happens inside each writer task over its own
  * co-located shard rows, on top of a shuffle that already paid the data
  * movement. Times shardAssign+write at a given SF dir with and without
  * the within-partition sort, twice each (alternating, second pair
  * steady), prints one JSON line.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=target/sf1 sbt "runMain graft.tools.ShardBench"`.
  */
object ShardBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val sharded = graft.operators.CurationOps
      .shardAssign(docs, col("doc_id"), rowsPerShard = 1000)
      .persist()
    sharded.count() // pay the rank computation once, outside both timers
    val out = java.nio.file.Files.createTempDirectory("shardbench").toString
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def unsorted(): Unit = sharded.repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$out/unsorted")
    def sorted(): Unit =
      graft.operators.CurationOps.writeShards(sharded, s"$out/sorted")
    val u1 = time(unsorted()); val s1 = time(sorted())
    val u2 = time(unsorted()); val s2 = time(sorted())
    println(s"""{"metric":"shard_write","sf":"$sfDir","rows":${sharded.count()},""" +
      s""""unsorted_cold":${math.rint(u1 * 1000) / 1000},"sorted_cold":${math.rint(s1 * 1000) / 1000},""" +
      s""""unsorted_steady":${math.rint(u2 * 1000) / 1000},"sorted_steady":${math.rint(s2 * 1000) / 1000}}""")
    sharded.unpersist(false)
    spark.stop()
  }
}

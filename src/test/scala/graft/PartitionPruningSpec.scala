package graft

import graft.engine.Scratch
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition pruning must be PLAN-visible: a filter on the partition column
  * of a hive-layout parquet table has to reach the scan as a partition
  * filter and shrink the file set — at 100 TB the difference between
  * scanning one day and scanning the archive. */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path: String = {
    val p = Scratch.dir(spark, "pruning_spec")
    (0 until 1000).map(i => (i.toLong, s"2024-01-0${i % 5 + 1}", i * 1.5))
      .toDF("id", "dt", "v")
      .repartition(col("dt")) // one task per dt → one file per partition dir
      .write.mode("overwrite").partitionBy("dt").parquet(p)
    p
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // force execution so AQE finalizes
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
  }

  test("partition-column filter prunes to one directory in-plan") {
    val pruned = spark.read.parquet(path).filter(col("dt") === "2024-01-03")
    val scan = scanOf(pruned)
    assert(scan.partitionFilters.nonEmpty, "filter did not become a partition filter")
    assert(scan.metrics("numFiles").value === 1L,
      s"expected 1 file after pruning, read ${scan.metrics("numFiles").value}")
    // and the unpruned scan proves the fixture really has 5 partitions
    assert(scanOf(spark.read.parquet(path)).metrics("numFiles").value === 5L)
  }

  test("pruned read returns exactly the partition's rows") {
    val n = spark.read.parquet(path).filter(col("dt") === "2024-01-03").count()
    assert(n === 200L)
  }
}

package graft.queries

import graft.engine.Tables
import graft.sources.CsvSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Source-format queries (SURVEY §2.1): the CSV batch source S10, plus the
  * ORC round-trip extension. */
object Sources extends QueryGroup {

  private val nationCsvSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** S10 (reference OR.csv:1 — header CSV scan): round-trip the `nation`
    * dimension through a header CSV file and aggregate FROM THE CSV; the
    * oracle computes the same aggregate from the parquet table, so the
    * check proves the CSV write/read path loses nothing (types declared via
    * explicit schema — the 100 TB discipline; no inferSchema double scan). */
  private val q44 = QueryDef(
    "q44_csv_source",
    (s, dir) => {
      val out = graft.engine.Scratch.dir(s, s"s10_csv_${new java.io.File(dir).getName}")
      Tables.nation(s, dir).orderBy("n_nationkey").coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(out)
      CsvSource.readHeaderCsv(s, out, Some(nationCsvSchema))
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_name"))
        .orderBy(col("n_regionkey"))
    },
    Some("""SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
           |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin))

  /** ORC batch source — same round-trip discipline as q44 for Spark's other
    * built-in columnar format (a switching user's tables may live in ORC):
    * write `supplier` to ORC, read it back, aggregate FROM THE ORC COPY;
    * the oracle aggregates the original parquet, so the check proves the
    * ORC write/read path is lossless for longs, strings, and decimals. */
  private val q51 = QueryDef(
    "q51_orc_source",
    (s, dir) => {
      val out = graft.engine.Scratch.dir(s, s"orc_${new java.io.File(dir).getName}")
      Tables.supplier(s, dir).write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          // acctbal is DOUBLE: summation order differs across engines, so
          // normalize to cents (the true sum's grain) on both sides
          graft.engine.Semantics.roundz(sum(col("s_acctbal")), 2).as("total_bal"),
          min(col("s_name")).as("first_name"))
        .orderBy(col("s_nationkey"))
    },
    Some("""SELECT s_nationkey, count(*) AS n_suppliers,
           |  round(sum(s_acctbal), 2) + 0.0 AS total_bal, min(s_name) AS first_name
           |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin))

  override val defs: Seq[QueryDef] = Seq(q44, q51)
}

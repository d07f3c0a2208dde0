package graft.queries

import graft.engine.Tables
import graft.sources.CsvSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Source-format queries (SURVEY §2.1): the CSV batch source S10. */
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
      val out = s"/tmp/graft_s10_csv_${new java.io.File(dir).getName}"
      Tables.nation(s, dir).orderBy("n_nationkey").coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(out)
      CsvSource.readHeaderCsv(s, out, Some(nationCsvSchema))
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_name"))
        .orderBy(col("n_regionkey"))
    },
    Some("""SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
           |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin))

  override val defs: Seq[QueryDef] = Seq(q44)
}

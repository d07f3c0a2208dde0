package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S10 (reference OR.csv:1): header-CSV batch source — the reference ships a
  * 37-column census CSV alongside its JSON feeds. Spark-native reading is a
  * plain `spark.read.csv` scan: splittable, predicate/projection still prune
  * at the reader (CSV can't skip columns in storage but does stop parsing
  * unprojected trailing fields), and schema is a declared contract.
  *
  * At 100 TB pass an explicit [[StructType]]: `inferSchema` is a SECOND full
  * pass over the data before the real scan. Inference is kept for ad-hoc
  * exploration only.
  */
object CsvSource {

  def readHeaderCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator instantiation: a Spark query over the testdata
  * tables plus (when ANSI-expressible) the equivalent DuckDB SQL the driver
  * uses as a correctness oracle.
  *
  * Contract (builder prompt + Verify.scala): column NAMES and types must match
  * between `spark` and `oracle` — the driver sorts columns by name before
  * hashing values. Every query is deterministically ordered (full tie-break
  * keys) so row order can never differ between engines.
  */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def defs: Seq[QueryDef]
}

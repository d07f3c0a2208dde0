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

/** Oracle-SQL fragments shared across query groups. */
object OracleSql {

  /** DuckDB expression equivalent to
    * [[graft.operators.SimilarityOps.signLshBucket]] over LITERAL
    * hyperplanes: bit j of the bucket is sign(v · p_j). The planes are
    * deterministic (fixed seed), so inlining their values keeps the bucket
    * function ANSI-expressible — which is what lets the LSH-bucketed queries
    * carry a hard hash oracle instead of a rows-only check. Both engines
    * accumulate the dot product left-to-right, so the sign agrees to the
    * last ulp. */
  def signLshBucketSql(vecExpr: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product($vecExpr, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
}

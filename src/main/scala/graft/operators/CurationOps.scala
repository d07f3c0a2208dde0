package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the training-data extension surface
  * (builder prompt; SURVEY §2.10): deterministic train/test splitting,
  * per-source quota sampling, and regex redaction. These are the steps that
  * sit between dedup (X1/X2) and tokenization in a large-scale LLM data
  * pipeline.
  *
  * Scale design: splitting and redaction are stateless narrow maps — zero
  * shuffle at any corpus size, and a document's split assignment never
  * changes as the corpus grows (hash membership, not row position — the
  * property that keeps eval sets leak-free across recrawls). Quota sampling
  * is one window over the group key. All hashing is md5 so the DuckDB
  * oracle reproduces assignments bit-for-bit.
  */
object CurationOps {

  /** Deterministic 0..99 bucket from an id: first 8 hex digits of
    * md5(id-as-string) mod 100. Uniform, engine-reproducible, and
    * independent of row order or partitioning. */
  def hashBucket100(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Split label from cumulative percentage cuts, e.g.
    * Seq("train" -> 80, "valid" -> 90, "test" -> 100): bucket < 80 → train,
    * 80..89 → valid, 90..99 → test. */
  def hashSplit(id: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 100, "cuts must be cumulative and end at 100")
    val b = hashBucket100(id)
    cuts.init.foldRight(lit(cuts.last._1): Column) { case ((label, cut), rest) =>
      when(b < cut, label).otherwise(rest)
    }
  }

  /** Per-group quota sampling: keep at most `k` rows per group,
    * deterministically — ranked by (md5(id), id), so the kept subset is a
    * uniform pseudo-random draw that is stable across runs, partitionings,
    * and engines. One shuffle on the group key. A pathologically hot group
    * serializes its own window sort; at 100 TB, pre-filter with an
    * approximate per-group rate (hashBucket100(id) < 100·k/n_g) to shed the
    * bulk before the exact rank — the window then sees ~k rows per group. */
  def quotaSample(df: DataFrame, group: Column, id: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(md5(id.cast("string")), id)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Regex redaction: replace every match of each pattern with its
    * placeholder and count the matches removed. Patterns must stay within
    * the RE2-compatible subset (no lookarounds) so the oracle engine agrees
    * on match boundaries. Stateless narrow map — the redaction analogue of
    * a PII scrub pass over 100 TB of text. */
  def redact(df: DataFrame, text: Column, patterns: Seq[(String, String)]): DataFrame = {
    val nRed = patterns
      .map { case (pat, _) => regexp_count(text, lit(pat)).cast("long") }
      .reduce(_ + _)
    val redacted = patterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    df.withColumn("n_redactions", nRed)
      .withColumn("text_redacted", redacted)
  }
}

package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Contract of the persisted BM25 inverted-index artifact (q158 exercises
  * the multi-query serving rollup; this spec pins build/persist/serve/
  * append): served scores are BIT-identical to the scan-everything
  * [[graft.operators.TextOps.bm25Scores]] path, survive a disk round-trip
  * unchanged, and the no-rescan append merge equals a full rebuild. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val docs = Seq(
    (1L, "the vector stream joins the hash table"),
    (2L, "stream stream stream of small rows"),
    (3L, "hash join on the big table"),
    (4L, "a filter then a sort then a merge"),
    (5L, "vector hash vector stream")).toDF("doc_id", "text")

  private def served(idx: TextOps.TextIndex, terms: Seq[String]) =
    TextOps.bm25Serve(idx, terms)
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        col("n_terms_matched"), col("bm25"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("served scores are bit-identical to the direct corpus-scan BM25") {
    val idx = TextOps.buildTextIndex(docs, col("doc_id"), col("text"))
    val terms = Seq("vector", "stream", "hash")
    val direct = TextOps.bm25Scores(docs, col("doc_id"), col("text"), terms)
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        col("n_terms_matched"), col("bm25"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(served(idx, terms) === direct)
    assert(direct.nonEmpty)
  }

  test("disk round-trip: write/read serves identical results; meta survives") {
    val idx = TextOps.buildTextIndex(docs, col("doc_id"), col("text"))
    val path = tmp("textindex")
    TextOps.writeTextIndex(spark, path, idx)
    val back = TextOps.readTextIndex(spark, path)
    assert(back.nDocs === idx.nDocs)
    assert(back.sumDl === idx.sumDl)
    val terms = Seq("vector", "stream", "hash")
    assert(served(back, terms) === served(idx, terms))
  }

  test("append merge (no corpus rescan) == full rebuild over the union") {
    val corpus = docs.filter(col("doc_id") <= 3)
    val fresh = docs.filter(col("doc_id") > 3)
    val appended = TextOps.appendTextIndex(
      TextOps.buildTextIndex(corpus, col("doc_id"), col("text")),
      fresh, col("doc_id"), col("text"))
    val rebuilt = TextOps.buildTextIndex(docs, col("doc_id"), col("text"))
    assert(appended.nDocs === rebuilt.nDocs)
    assert(appended.sumDl === rebuilt.sumDl)
    val terms = Seq("stream", "merge", "filter")
    assert(served(appended, terms) === served(rebuilt, terms))
  }

  test("append of an EMPTY fresh batch is a no-op, not a crash") {
    // An ingest loop legitimately delivers empty micro-batches between
    // arrivals (round-10 ADVICE: this used to throw on TextIndex's
    // nDocs > 0 contract).
    val idx = TextOps.buildTextIndex(docs, col("doc_id"), col("text"))
    val appended = TextOps.appendTextIndex(
      idx, docs.filter(col("doc_id") < 0), col("doc_id"), col("text"))
    assert(appended.nDocs === idx.nDocs)
    assert(appended.sumDl === idx.sumDl)
    val terms = Seq("vector", "stream")
    assert(served(appended, terms) === served(idx, terms))
  }

  test("refusals: malformed meta, missing postings columns, empty query") {
    val idx = TextOps.buildTextIndex(docs, col("doc_id"), col("text"))
    intercept[IllegalArgumentException] {
      TextOps.bm25Serve(idx, Seq.empty)
    }
    // unknown term: no postings rows, empty result — not an error
    assert(served(idx, Seq("zzz_not_a_term")).isEmpty)
    val path = tmp("textindex_bad")
    TextOps.writeTextIndex(spark, path, idx)
    // corrupt the meta to 2 rows
    Seq((1L, 1L), (2L, 2L)).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").parquet(s"$path/meta")
    intercept[IllegalArgumentException] {
      TextOps.readTextIndex(spark, path)
    }
    // postings table missing a required column
    val path2 = tmp("textindex_bad2")
    TextOps.writeTextIndex(spark, path2, idx)
    spark.read.parquet(s"$path2/postings").drop("tf")
      .write.mode("overwrite").parquet(s"$path2/postings_tmp")
    val pdir = new java.io.File(s"$path2/postings")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(pdir)
    new java.io.File(s"$path2/postings_tmp").renameTo(pdir)
    intercept[IllegalArgumentException] {
      TextOps.readTextIndex(spark, path2)
    }
  }

  test("index geometry: postings carry one row per (term, doc) with true tf") {
    val idx = TextOps.buildTextIndex(docs, col("doc_id"), col("text"))
    val p = idx.postings
      .filter(col("term") === "stream")
      .select(col("doc_id"), col("tf"))
      .as[(Long, Long)].collect().toMap
    assert(p === Map(1L -> 1L, 2L -> 3L, 5L -> 1L))
    assert(idx.nDocs === 5L)
  }
}

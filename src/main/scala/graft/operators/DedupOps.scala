package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data extension surface (builder
  * prompt; SURVEY §2.10 X1/X2): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: nothing here is O(n²) over the corpus. Exact/fingerprint
  * dedup is a hash aggregate; MinHash/SimHash candidate generation goes
  * through band-bucket self-joins (pairs only form inside a bucket, which
  * LSH theory keeps small); the full-Jaccard verifier joins on shared
  * shingles, never on the cross product. All hashing is md5-based so the
  * DuckDB oracle can reproduce it bit-for-bit (xxhash64 would be faster but
  * is not cross-engine).
  */
object DedupOps {

  /** X1: exact dedup — hash-groupBy on content hash; min(id) is the
    * deterministic keeper (dropDuplicates keeps an arbitrary row, which
    * would not be oracle-stable). One shuffle on the hash. */
  def exactDedupGroups(df: DataFrame, id: Column, content: Column): DataFrame =
    df.groupBy(md5(content).as("content_hash"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature column: for hash function j, h_j(doc) = MIN over the
    * doc's shingle set of md5(j || ':' || shingle). md5 hex strings compare
    * lexicographically uniformly, so the string MIN is a valid minwise
    * hash — and is reproducible in any engine with md5. */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(shingleSet, s => md5(concat(lit(j.toString), lit(":"), s))))
    }: _*)

  /** X2 (MinHash+LSH): candidate near-dup pairs. Explodes each doc's
    * signature into (bandKey, doc) rows and self-joins per band — the LSH
    * bucket join. `rowsPerBand` = 1 suits the tiny test corpus (low true
    * Jaccard); production corpora use r=2..4 to keep buckets selective.
    * Output: (a_id, b_id, n_shared_bands), a < b, deterministic. */
  def minhashLshCandidates(docs: DataFrame, id: String, shingleSet: Column,
      numHashes: Int, bucketCol: Column): DataFrame = {
    val sigs = docs
      .select(col(id), bucketCol.as("bucket"), minhashSignature(shingleSet, numHashes).as("sig"))
      .filter(size(col("sig")) > 0)
    val bands = sigs.select(col(id), col("bucket"), posexplode(col("sig")).as(Seq("band", "h")))
    val a = bands.toDF("a_id", "bucket", "band", "h")
    val b = bands.toDF("b_id", "bucket", "band", "h")
    a.join(b, Seq("bucket", "band", "h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** X2 (n-gram Jaccard verifier): true Jaccard over shingle sets for pairs
    * sharing ≥1 shingle inside a bucket. The shingle join generates only
    * pairs with nonzero intersection — never the cross product. */
  def jaccardPairs(docs: DataFrame, id: String, shingleSet: Column, bucketCol: Column): DataFrame = {
    val sets = docs.select(col(id), bucketCol.as("bucket"), shingleSet.as("shset"))
      .filter(size(col("shset")) > 0)
    val sizes = sets.select(col(id), col("bucket"), size(col("shset")).cast("long").as("setsize"))
    val ex = sets.select(col(id), col("bucket"), explode(col("shset")).as("sh"))
    val common = ex.toDF("a_id", "bucket", "sh")
      .join(ex.toDF("b_id", "bucket", "sh"), Seq("bucket", "sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(id).as("a_id"), col("setsize").as("a_size")), "a_id")
      .join(sizes.select(col(id).as("b_id"), col("setsize").as("b_size")), "b_id")
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("a_size") + col("b_size") - col("n_common")).cast("double"), 6))
  }

  /** X2 (embedding-cosine near-dup): pairs whose embedding cosine meets the
    * threshold, candidate generation bounded by a coarse cell (IVF-style
    * quantizer cell / partition key at scale) so the join is cell×cell,
    * never corpus×corpus. Production pipelines put a random-hyperplane LSH
    * in front when cells are large; the verifier below is exact. */
  def embeddingNearDups(embs: DataFrame, id: String, emb: Column, cellCol: Column,
      threshold: Double): DataFrame = {
    val e = embs.select(col(id), cellCol.as("cell"), emb.cast("array<double>").as("v"))
    val a = e.toDF("a_id", "cell", "a_v")
    val b = e.toDF("b_id", "cell", "b_v")
    a.join(b, "cell")
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", round(SimilarityOps.cosine(col("a_v"), col("b_v")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** X2 (SimHash): 32-bit signature. Bit i of the signature is the sign of
    * the sum over the doc's distinct tokens of ±1, where the vote of a token
    * is the high bit of hex digit i of md5(token). Pure relational:
    * explode(tokens) × 32 positions → two hash aggregates — no UDF, and the
    * same expression runs verbatim in the oracle engine. */
  def simhash32(docs: DataFrame, id: String, tokenSet: Column): DataFrame = {
    val toks = docs.select(col(id), explode(tokenSet).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bits = toks.select(col(id), col("h"),
        posexplode(transform(sequence(lit(0), lit(31)),
          i => when(substring(col("h"), 1, 32).substr(i + 1, lit(1)).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L).otherwise(-1L)))
          .as(Seq("pos", "vote")))
      .groupBy(col(id), col("pos"))
      .agg(sum(col("vote")).as("votes"))
    bits.groupBy(col(id))
      .agg(sum(when(col("votes") > 0, expr("shiftleft(CAST(1 AS BIGINT), pos)")).otherwise(0L)).as("simhash"))
  }
}

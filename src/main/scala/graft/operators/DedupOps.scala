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

  /** X2 (MinHash+LSH, row form — the scale path): same candidate semantics
    * as [[minhashLshCandidates]] but over exploded (doc_id, bucket, sh) rows
    * from [[TextOps.shingleRows]], with Kirsch–Mitzenmacher hashing: ONE
    * codegen'd md5 per shingle split into two 40-bit halves (h1, h2), then
    * hash function j is min(h1 + j·h2) — a plain hash aggregate. Everything
    * stays inside WholeStageCodegen (profiled 20× faster than the
    * interpreted per-j lambda-md5 variant), and 40-bit values keep
    * h1 + 7·h2 < 2^43, overflow-safe in engines that error on BIGINT
    * overflow (DuckDB). */
  def minhashLshCandidatesFromRows(shingles: DataFrame, numHashes: Int): DataFrame = {
    val hashed = shingles
      .withColumn("h", md5(col("sh")))
      .withColumn("h1", conv(substring(col("h"), 1, 10), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("h"), 11, 10), 16, 10).cast("long"))
    val mins = (0 until numHashes).map(j => min(col("h1") + lit(j.toLong) * col("h2")).as(s"m$j"))
    val sigs = hashed.groupBy(col("doc_id"), col("bucket"))
      .agg(mins.head, mins.tail: _*)
    val bands = sigs.select(col("doc_id"), col("bucket"),
      posexplode(array((0 until numHashes).map(j => col(s"m$j")): _*)).as(Seq("band", "h")))
    val a = bands.toDF("a_id", "bucket", "band", "h")
    val b = bands.toDF("b_id", "bucket", "band", "h")
    a.join(b, Seq("bucket", "band", "h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** X2 (n-gram Jaccard, row form — the scale path): true Jaccard from
    * exploded (doc_id, bucket, sh) rows. Pairs form only on shared shingles
    * inside a bucket (never the cross product), and the whole pipeline is
    * joins + hash aggregates — no interpreted array lambdas. */
  def jaccardPairsFromRows(shingles: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Set size rides along as a window count: HashPartitioning(doc_id) from
    // shingleRows' window/distinct already satisfies it — no extra shuffle,
    // and no separate `sizes` aggregate to join (which would re-evaluate the
    // whole shingle pipeline twice more). Both self-join sides are then
    // IDENTICAL subplans shuffled on (bucket, sh), so Spark's exchange reuse
    // computes the pipeline once and reads it twice.
    val ex = shingles.withColumn("setsize",
      count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val a = ex.toDF("a_id", "bucket", "sh", "a_size")
    val b = ex.toDF("b_id", "bucket", "sh", "b_size")
    a.join(b, Seq("bucket", "sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_common"),
        max(col("a_size")).as("a_size"), max(col("b_size")).as("b_size"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("a_size") + col("b_size") - col("n_common")).cast("double"), 6))
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
    // Norms are computed per VECTOR below the join's shuffle barrier (2 fold
    // evaluations per row), not per PAIR above it (which would be quadratic
    // in interpreted-lambda evaluations — the dot product is the only
    // per-pair fold left).
    val e = embs.select(col(id), cellCol.as("cell"), emb.cast("array<double>").as("v"))
      .withColumn("nrm", SimilarityOps.l2norm(col("v")))
    val a = e.toDF("a_id", "cell", "a_v", "a_nrm")
    val b = e.toDF("b_id", "cell", "b_v", "b_nrm")
    a.join(b, "cell")
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine",
        round(SimilarityOps.dot(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** X2 (SimHash): 32-bit signature. Bit i of the signature is the sign of
    * the sum over the doc's distinct tokens of ±1, where the vote of a token
    * is the high bit of hex digit i of md5(token). Pure relational:
    * explode(tokens) × 32 positions → two hash aggregates — no UDF, and the
    * same expression runs verbatim in the oracle engine. */
  def simhash32(docs: DataFrame, id: String, tokenSet: Column): DataFrame = {
    // posexplode(split(h, "")) yields one row per hex digit — identical votes
    // to the earlier per-position lambda transform, but with no interpreted
    // higher-order expression feeding the Generate (keeps codegen).
    val toks = docs.select(col(id), explode(tokenSet).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bits = toks.select(col(id), posexplode(split(col("h"), "")).as(Seq("pos", "digit")))
      .withColumn("vote",
        when(col("digit").isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L).otherwise(-1L))
      .groupBy(col(id), col("pos"))
      .agg(sum(col("vote")).as("votes"))
    bits.groupBy(col(id))
      .agg(sum(when(col("votes") > 0, expr("shiftleft(CAST(1 AS BIGINT), pos)")).otherwise(0L)).as("simhash"))
  }
}

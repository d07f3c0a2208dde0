package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{DedupOps, SimilarityOps, TextOps}

/** Scale audit: logs the CANDIDATE-pair volume of every bucket-bounded
  * near-dup plan at a given scale factor, against the all-pairs volume the
  * same corpus would produce without banding. Run it at two scale factors
  * and compare: a plan that survives 100 TB must grow candidates ~linearly
  * with the corpus (tracking true near-dup density), not quadratically
  * (corpus²/buckets). One JSON line, same contract style as [[Bench]].
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.ScaleAudit"
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1  sbt "runMain graft.ScaleAudit"
  * }}}
  */
object ScaleAudit {

  /** The CALIBRATED dedup pipeline's measurement family — 5-gram shingles →
    * 0.95-quantile df cap (floor 2) → r=1 and banded r=2 LSH candidates →
    * exact-Jaccard verify (≥ 0.5) → exact ground truth — extracted so the
    * full audit and the three-decade [[ScaleAuditCalibrated]] run measure
    * the SAME plans (a copy would drift). Returns the count rows keyed as
    * the audit JSON names them. */
  private[graft] def calibratedFiveGramRows(docs: org.apache.spark.sql.DataFrame)
      : scala.collection.immutable.ListMap[String, Long] = {
    val fiveGramSh = TextOps.shingleRows(docs, col("doc_id"), lit("all"), col("text"), n = 5)
      .localCheckpoint(true)
    val fiveGram = DedupOps.minhashLshCandidatesFromRows(
      DedupOps.capShingleDfQuantile(fiveGramSh, 0.95, floor = 2), 8).count()
    val q124Cand = DedupOps.minhashLshCandidatesBanded(
      DedupOps.capShingleDfQuantile(fiveGramSh, 0.95, floor = 2), 8, rowsPerBand = 2)
      .localCheckpoint(true)
    val q124CandN = q124Cand.count()
    val q124Verified = DedupOps.jaccardVerifyPairs(q124Cand, fiveGramSh, 0.5).count()
    val q124True = DedupOps.jaccardPairsFromRows(fiveGramSh)
      .filter(col("jaccard") >= 0.5).count()
    fiveGramSh.unpersist(false)
    q124Cand.unpersist(false)
    scala.collection.immutable.ListMap(
      "q118_5gram_candidates" -> fiveGram,
      "q124_banded_5gram_candidates" -> q124CandN,
      "q124_verified_pairs" -> q124Verified,
      "q124_true_pairs" -> q124True)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    // All-pairs volume the round-1 plans would have generated: sum over
    // source buckets of n·(n−1)/2.
    val allPairsDocs = docs.groupBy("source").count()
      .agg(coalesce(sum(expr("count * (count - 1) DIV 2")), lit(0L))).head.getLong(0)

    val shingles = TextOps.shingleRows(docs, col("doc_id"), col("source"), col("text"))
    // pairMassBudget = 0 (guard off): this audit IS the instrument that
    // measures the fixed cap's blow-up curve — it must be able to count
    // past the refusal point the production guard enforces.
    val q22 = DedupOps.jaccardPairsFromRows(shingles, maxDf = 50,
      pairMassBudget = 0L).count()
    val q23 = DedupOps.minhashLshCandidatesFromRows(shingles, 8, maxDf = 50).count()
    val toks = docs.withColumn("tokset", array_distinct(TextOps.tokenize(col("text"))))
    // bandMassBudget = 0 (guard off): measurement instrument — the audit
    // counts past the refusal point the production guard enforces.
    val q24 = DedupOps.simhashBandCandidates(toks, "doc_id", col("tokset"), col("source"),
      bandMassBudget = 0L).count()
    // The production posture on adversarially self-similar corpora: band
    // buckets capped at 100 members (recall trade documented on the op).
    val q24Capped = DedupOps
      .simhashBandCandidates(toks, "doc_id", col("tokset"), col("source"), maxBucket = 100,
        bandMassBudget = 0L).count()

    // q50 decontamination: both sides grow LINEARLY — probe = test-split
    // shingle rows, build = train-split distinct vocabulary (sublinear on
    // real corpora as vocabulary saturates).
    val split = graft.operators.CurationOps.hashSplit(col("doc_id"),
      Seq("train" -> 80, "valid" -> 90, "test" -> 100))
    val withSplit = docs.withColumn("split", split)
    val testShinglesDf = TextOps.shingleRows(
      withSplit.filter(col("split") === "test"), col("doc_id"), col("split"), col("text"))
      .localCheckpoint(true)
    val testShingles = testShinglesDf.count()
    val trainVocabDf = TextOps.shingleRows(
      withSplit.filter(col("split") === "train"), col("doc_id"), col("split"), col("text"))
      .select("sh").distinct().localCheckpoint(true)
    val trainVocab = trainVocabDf.count()

    // q56 bloom prefilter: what fraction of the probe stream survives the
    // broadcast sketch vs truly hits the vocabulary. bloomPos − exactHits =
    // false positives paying the rescan join; at scale the prefilter must
    // shrink the join's probe side to (true overlap + ε), and ε tracks the
    // sizing rule (BloomUtil.sizeFor → fp ≈ 2^−k at design load).
    val bloomK = 5
    val bloomM = graft.functions.BloomUtil.sizeFor(trainVocab, bloomK)
    val bloomAgg = org.apache.spark.sql.functions.udaf(
      new graft.functions.BloomBuild(bloomM, bloomK), org.apache.spark.sql.Encoders.STRING)
    val bloom = trainVocabDf.agg(bloomAgg(col("sh"))).head.getAs[Array[Byte]](0)
    val bloomPos = testShinglesDf
      .filter(graft.functions.GraftFunctions.bloomContains(col("sh"), bloom, bloomK)).count()
    val exactHits = testShinglesDf.join(trainVocabDf, Seq("sh")).count()

    // q67 repeated-chunk removal: the df table (distinct chunks) is the only
    // state; hot chunks (df > 1) are what the op removes. Distinct-chunk
    // growth must stay ≤ linear (sublinear once the corpus repeats itself —
    // the same saturation as the q50 vocabulary).
    val chunkRows = DedupOps.repeatedChunkRemoval(docs, "doc_id", col("text"))
    val q67Removed = chunkRows.agg(sum(col("n_removed"))).head.getLong(0)
    val distinctChunks = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast(ceil(size(split(text, ' ')) / 10.0) as int) - 1," +
          " 1), i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' '))")).as("chunk"))
      .select(md5(col("chunk"))).distinct().count()

    // q73 idf-weighted shingle cosine shares q22's bounded shared-shingle
    // join; its pair volume before the cosine threshold IS the q22 row.
    val q73 = DedupOps.tfidfCosinePairs(shingles, maxDf = 50, minCosine = 0.02,
      pairMassBudget = 0L).count() // guard off: measurement instrument

    // q85 content-defined chunking: same df-table state class as q67's
    // fixed chunks — the SATURATING quantity is the distinct CDC-chunk
    // count (the df-table state), mirroring q67's distinctChunks; total
    // chunk rows grow linearly with the corpus and are not the bound.
    // One aggregate action covers both removal figures (a second .head
    // would recompute the whole CDC pipeline).
    val cdcRows = DedupOps.cdcChunkRemoval(docs, "doc_id", col("text"))
    val q85Agg = cdcRows.agg(
      coalesce(sum(col("n_removed")), lit(0L)).as("removed"),
      (coalesce(sum(col("n_kept")), lit(0L))
        + coalesce(sum(col("n_removed")), lit(0L))).as("total")).head
    val q85Removed = q85Agg.getLong(0)
    val q85ChunkRows = q85Agg.getLong(1)
    val q85DistinctChunks = DedupOps.cdcChunks(docs, "doc_id", col("text"))
      .select(col("ch")).distinct().count()

    // q78 split-leakage audit joins GLOBAL-bucket MinHash candidates (leaks
    // cross source boundaries) — a strictly larger pool than q23's
    // per-source rows; must still track dup density, not corpus².
    val globalShingles = TextOps.shingleRows(docs, col("doc_id"), lit("all"), col("text"))
    val q78 = DedupOps.minhashLshCandidatesFromRows(globalShingles, 8, maxDf = 50).count()
    // q118 calibrated variant: the 0.95-quantile df cap in place of the
    // fixed df≤50 — the row that shows the quantile cap KEEPS generating
    // candidates at sf1 where the fixed cap collapses (df grew past 50 for
    // ~96% of the saturated global vocabulary).
    val q118 = DedupOps.minhashLshCandidatesFromRows(
      DedupOps.capShingleDfQuantile(globalShingles, 0.95), 8).count()
    // q120 banded variant (r=2) COMPOSED with the quantile cap — the two
    // saturation knobs a production pipeline runs together: the cap keeps
    // the pipeline live (q118 row), banding's S-curve (P = 1 − (1 − j²)⁴
    // vs r=1's 1 − (1 − j)⁸) then crushes the one-hot-minhash pair mass
    // the cap alone still admits. Contrast against the q118 row.
    val cappedShingles = DedupOps.capShingleDfQuantile(globalShingles, 0.95)
      .localCheckpoint(true)
    val q120 = DedupOps.minhashLshCandidatesBanded(
      cappedShingles, 8, rowsPerBand = 2).count()
    // r=4 (2 bands of 4): the next S-curve step — P = 1 − (1 − j⁴)² —
    // documents the knob's progression on this corpus's Jaccard mass.
    val q120r4 = DedupOps.minhashLshCandidatesBanded(
      cappedShingles, 8, rowsPerBand = 4).count()
    cappedShingles.unpersist(false)
    // The REPRESENTATION knob, same pipeline: 5-gram shingles instead of
    // 3-gram. Under vocabulary saturation the 3-gram universe caps at
    // ~|V|³-ish and df grows with the corpus; widening to 5 grows the
    // universe geometrically and drops df back to discriminative levels —
    // the remedy volume knobs (cap, banding) cannot provide. Quantile cap
    // + r=1, directly comparable to the q118 row.
    // floor = 2: on a sparse 5-gram universe the discrete 0.95-quantile
    // can land on t = 1, which drops every SHARED shingle (true dups
    // included — measured as exactly 0 candidates at sf0.01 without the
    // floor). The floor keeps shared evidence alive at any sparsity.
    // q124 end-to-end rows (q118 r=1 / banded r=2 candidates, verified,
    // ground truth): the calibrated family, shared with the three-decade
    // run — see [[calibratedFiveGramRows]] for the plan and the
    // recall-isolation rationale (verified ⊆ true by construction; the
    // verify pool is structurally bounded by the generator's output).
    val calib = calibratedFiveGramRows(docs)
    val fiveGram = calib("q118_5gram_candidates")
    val q124CandN = calib("q124_banded_5gram_candidates")
    val q124Verified = calib("q124_verified_pairs")
    val q124True = calib("q124_true_pairs")

    val embs = Tables.embeddings(spark, sfDir)
    val nVecs = embs.count()
    val allPairsVecs = embs.groupBy("label").count()
      .agg(coalesce(sum(expr("count * (count - 1) DIV 2")), lit(0L))).head.getLong(0)
    // (cell × sign-LSH bucket) pair volume — the shared candidate generator
    // behind q32 embedding near-dup, q61 semantic dedup, AND q31's k-NN
    // join (ordered candidates = 2× these unordered pairs); all_pairs_vecs
    // above is what any of them would generate cell-only.
    val q32 = DedupOps.embeddingCandidates(embs, "vec_id", col("embedding"), col("label"),
      SimilarityOps.lshPlanes(2, 64)).count()
    // q88/q89 OR-ed 2-table generator: distinct pairs matching ANY table's
    // bucket — must stay ≤ 2× the single-table row above (and both track
    // density, not corpus²). The recall lift this buys is spec-verified
    // (MultiTableLshSpec); this row proves the cost side stays bounded.
    val q88 = DedupOps.embeddingCandidatesTables(embs, "vec_id", col("embedding"), col("label"),
      SimilarityOps.lshTables(2, 2, 64)).count()

    // q61 semantic-dedup graph: nodes/components of the cosine-VERIFIED
    // pair graph (q32's output, the actual CC input) — per-round CC work is
    // O(|verified edges|), candidate volume above bounds the verifier;
    // nodes − components = docs the semantic dedup deletes.
    val semEdges = DedupOps.embeddingNearDups(embs, "vec_id", col("embedding"), col("label"),
      0.35, SimilarityOps.lshPlanes(2, 64),
      bucketMassBudget = 0L /* measurement instrument — guard disabled */)
      .localCheckpoint(true)
    val semCc = graft.operators.GraphOps.connectedComponents(semEdges, "a_id", "b_id")
    val semNodes = semCc.count()
    val semComps = semCc.select("comp").distinct().count()

    // r15 OCCUPANCY-pinned semantic geometry (the production semanticComps
    // path): chosen depth, candidate pairs, and exact bucket pair mass
    // Σ C(n, 2) under the ladder's choice. The mass row is the claim to
    // track across tiers: with occupancy pinned it must grow LINEARLY in
    // the corpus (≈ n·occ·T/2), where the fixed 2-plane row above
    // (q32_cell_lsh_candidates) is measured quadratic.
    val semDepth = graft.queries.SharedPipelines.tunedSemanticDepth(spark, sfDir)
    val semOccTables = SimilarityOps.lshTables(
      graft.queries.SharedPipelines.semTables, semDepth, 64)
    val semOccCand = DedupOps.embeddingCandidatesTables(embs, "vec_id",
      col("embedding"), col("label"), semOccTables).count()
    val semOccMass = SimilarityOps.lshCandidateRows(embs, "vec_id",
        col("embedding"), col("label"), semOccTables, "n_")
      .groupBy(col("cell"), col("tb")).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(expr("__n * (__n - 1) DIV 2")), lit(0L)))
      .head.getLong(0)

    // q53/q61 cluster graphs: nodes/components from the minhash pair list.
    // The CC loop's work per round is O(|edges|); what must stay bounded as
    // the corpus grows is the edge list (candidate volumes above) — the
    // node/component counts here show cluster structure, and their ratio
    // the dedup payoff (docs deleted = nodes − components).
    val ccIn = DedupOps.minhashLshCandidatesFromRows(shingles, 8, maxDf = 50)
      .localCheckpoint(true)
    val cc = graft.operators.GraphOps.connectedComponents(ccIn, "a_id", "b_id")
    val ccNodes = cc.count()
    val ccComps = cc.select("comp").distinct().count()

    // q111 incremental merge: the standing state a crawl batch replays is
    // ONE star edge per labeled node (≈ cc_nodes — linear in clustered
    // docs), plus the batch's own pairs; a full recompute pays the whole
    // q23 edge list every crawl. star_edges + new_batch_pairs ≪ full edge
    // list (and star growth tracks nodes, not pairs) is the win.
    val isNew = (c: org.apache.spark.sql.Column) => c % 5 === 0
    val q111Stars = graft.operators.GraphOps.connectedComponents(
        ccIn.filter(!isNew(col("a_id")) && !isNew(col("b_id"))), "a_id", "b_id")
      .filter(col("node") =!= col("comp")).count()
    val q111NewPairs = ccIn.filter(isNew(col("a_id")) || isNew(col("b_id"))).count()

    // q110 hard-negative mining: scored candidate rows for the 10-query
    // batch — bounded by (cell × LSH bucket) occupancy around each query,
    // never queries × corpus (all_pairs would be 10 × vecs).
    val q110Rows = SimilarityOps.knnJoin(embs, embs.filter(col("vec_id") < 10),
      "label", Int.MaxValue, SimilarityOps.lshPlanes(2, 64)).count()

    // q106 BM25: the only stream crossing a shuffle is (doc, query-term)
    // matches — bounded by |query| per doc, a vanishing fraction of the
    // token stream.
    val q106Match = TextOps.bm25Scores(docs, col("doc_id"), col("text"),
        Seq("vector", "stream", "hash"))
      .agg(coalesce(sum(col("n_terms_matched")), lit(0L))).head.getLong(0)

    // q112 recall audit, measured (not just the (1−θ/π)^p algebra): mean
    // recall@10 of the 2-plane single-table LSH k-NN join vs the OR-ed
    // 2-table variant, against the exact same-cell neighbor lists. The
    // number that justifies (or indicts) paying q88's ≤2× candidate
    // volume for the multi-table index.
    val knnQ = embs.filter(col("vec_id") < 10)
    val truth = SimilarityOps.knnJoin(embs, knnQ, "label", 10).localCheckpoint(true)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      SimilarityOps.recallAtK(truth, approx)
        .agg(avg(col("recall"))).head.getDouble(0)
    val recall1 = meanRecall(
      SimilarityOps.knnJoin(embs, knnQ, "label", 10, SimilarityOps.lshPlanes(2, 64)))
    val recall2 = meanRecall(
      SimilarityOps.knnJoinTables(embs, knnQ, "label", 10, SimilarityOps.lshTables(2, 2, 64)))

    // q117 auto-tuner: the configuration the recall-targeting sweep CHOOSES
    // (cheapest measured mean recall@10 ≥ 0.8 across six (tables, planes)
    // points) and its measured cost — recall ≥ 0.8 at a KNOWN candidate
    // volume is the row that certifies an index config for deployment.
    // headOption: a corpus where no swept config meets the target reports
    // -1s rather than failing the whole audit.
    val tuned = SimilarityOps.lshAutoTune(embs, knnQ, "label", 10,
        Seq((1, 2), (2, 2), (4, 2), (8, 2), (2, 4), (4, 4)), 64, 0.8)
      .filter(col("chosen")).collect().headOption
    val tunedTables = tuned.map(_.getAs[Int]("n_tables")).getOrElse(-1)
    val tunedPlanes = tuned.map(_.getAs[Int]("n_planes")).getOrElse(-1)
    val tunedRecall = tuned.map(_.getAs[Double]("mean_recall")).getOrElse(-1d)
    val tunedCand = tuned.map(_.getAs[Long]("candidate_pairs")).getOrElse(-1L)

    // q141 serving geometry: mean corpus rows per (cell, table-bucket)
    // under the TUNED config vs the pinned 1-table/2-plane baseline, plus
    // the tuned candidate bill per query. The fixed config's occupancy
    // grows linearly with the corpus by construction (same divisor, 10×
    // the rows — BASELINE's n²/(cells·2^p) row is its pair-volume shadow);
    // the tuner re-chooses geometry per corpus under a FIXED recall
    // contract, so its per-query candidate bill must grow sublinearly —
    // that contrast is the scale story these two rows record.
    def meanBucketOccupancy(tables: Seq[Seq[Seq[Double]]]): Double =
      SimilarityOps.lshCandidateRows(embs, "vec_id", col("embedding"),
          col("label"), tables, "n_")
        .groupBy(col("cell"), col("tb")).count()
        .agg(avg(col("count"))).head.getDouble(0)
    val tunedOcc = if (tunedTables > 0)
      meanBucketOccupancy(SimilarityOps.lshTables(tunedTables, tunedPlanes, 64))
      else -1d
    val fixedOcc = meanBucketOccupancy(SimilarityOps.lshTables(1, 2, 64))
    val tunedCandPerQuery = if (tunedCand >= 0) tunedCand / 10.0 else -1d

    // q141 serving-cost split (round-10 verdict task #2): the sweep is a
    // TRAIN-time cost once the tuned geometry persists in the AnnIndex
    // artifact. Row pair = wall seconds of (a) trainTunedAnnIndex — Lloyd
    // + full recall sweep, paid once per corpus — vs (b) serveAnn from the
    // RELOADED artifact — the per-batch serving bill a query fleet pays.
    // (b) ≪ (a) is the measurement that the serve path excludes the sweep.
    val annDir = graft.engine.Scratch.dir(spark, "audit_tuned_ann")
    val t0Train = System.nanoTime()
    val trainedIdx = SimilarityOps.trainTunedAnnIndex(embs, "vec_id",
      col("embedding"), dim = 64, kCells = 8, lloydIters = 3, queries = knnQ,
      k = 10, configs = Seq((1, 2), (2, 2), (4, 2), (8, 2), (2, 4), (4, 4)),
      recallTarget = 0.8)
    SimilarityOps.writeAnnIndex(spark, annDir, trainedIdx)
    val trainSec = (System.nanoTime() - t0Train) / 1e9
    val t0Serve = System.nanoTime()
    val servedIdx = SimilarityOps.readAnnIndex(spark, annDir)
    val serveRows = SimilarityOps.serveAnn(embs, knnQ, "vec_id",
      col("embedding"), servedIdx, k = 10).count()
    val serveSec = (System.nanoTime() - t0Serve) / 1e9

    // q143 bloom-pruned incremental dedup: the prefilter's job is to keep
    // the exact anti-join's probe side at (true dupes + ε·fresh). Across
    // SFs the positive row count must track the TRUE dupe count, with the
    // auto-sized filter holding ε near 2^-k — not drift toward the fresh
    // total (a saturating filter would).
    val docsFp = docs.withColumn("fp", md5(col("text").cast("binary")))
    val corpus143 = docsFp.filter(col("doc_id") % 10 < 8)
    val fresh143 = docsFp.filter(col("doc_id") % 10 >= 8).localCheckpoint(true)
    val idx143 = DedupOps.buildFingerprintBloom(corpus143, col("fp"))
    val fresh143N = fresh143.count()
    val bloomPos143 = fresh143.filter(
      graft.functions.GraftFunctions.bloomContains(col("fp"), idx143.sketch, idx143.k)).count()
    val trueDup143 = fresh143.join(
      corpus143.select("fp").distinct(), Seq("fp"), "left_semi").count()

    // q158 served BM25: per-query cost is the QUERY's postings, not the
    // corpus — the ratio total/query is the serving leverage the persisted
    // index buys, and query postings grow with term df (linear in corpus),
    // never with vocabulary or doc count directly.
    val idx158 = TextOps.buildTextIndex(docs, col("doc_id"), col("text"))
    val q158Total = idx158.postings.count()
    val q158Query = idx158.postings
      .filter(col("term").isin("vector", "stream", "hash")).count()

    // q162 weighted (multiset) near-dup: the expansion is bounded by
    // Σ min(tf, cap) ≤ positional row count (reported to prove the multiset
    // pipeline never exceeds the set pipeline's input volume), and the
    // calibrated generator + verify must track dup density across SFs just
    // like the set family's q120/q124 rows.
    val tf162 = DedupOps.featureTfRows(
      TextOps.shinglePosRows(docs, col("doc_id"), lit("all"), col("text"), n = 5))
      .localCheckpoint(true)
    val ex162 = DedupOps.weightedExpandRows(tf162, tfCap = 4).localCheckpoint(true)
    val ex162Rows = ex162.count()
    val cand162 = DedupOps.nearDupCandidates(ex162,
      DedupOps.CandidateGen.QuantileCapped(q = 0.95, floor = 2,
        numHashes = 8, rowsPerBand = 2)).localCheckpoint(true)
    val cand162N = cand162.count()
    val ver162 = DedupOps.weightedJaccardVerifyPairs(cand162,
      tf162.drop("bucket"), 0.2).count()
    ex162.unpersist(false); cand162.unpersist(false); tf162.unpersist(false)

    // q161 bloom-reduced join: the prefilter must shrink the fact side's
    // exchange to (true matching rows + ε·2^-k of the rest) — reported as
    // fact rows, bloom-positive rows, and true matching rows, same contract
    // as the q143 row but on the JOIN probe side.
    val li161 = Tables.lineitem(spark, sfDir)
    val dim161 = Tables.part(spark, sfDir).filter(col("p_size") <= 2)
      .select(col("p_partkey")).distinct().localCheckpoint(true)
    val fact161 = li161.count()
    val idx161 = DedupOps.buildFingerprintBloom(dim161, col("p_partkey"))
    val pos161 = li161.filter(graft.functions.GraftFunctions
      .bloomContains(col("l_partkey").cast("string"), idx161.sketch, idx161.k)).count()
    val true161 = li161.join(dim161,
      li161("l_partkey") === dim161("p_partkey"), "left_semi").count()

    // q174 standing-state bound: the histogram a StandingStore must hold
    // to serve the sampled jackknife is the SAMPLED slice's distinct
    // (source, fp) keys — reported against the row count it replaces
    // (rescanning 3/16 of the corpus per sizing question).
    val d174 = Tables.documents(spark, sfDir)
      .withColumn("fp", substring(md5(col("text").cast("binary")), 1, 3))
      .withColumn("sb", substring(md5(col("fp").cast("binary")), 1, 1))
      .filter(col("sb").isin("0", "1", "2"))
    val sampled174 = d174.count()
    val hist174 = d174.select(col("source"), col("fp")).distinct().count()

    println(s"""{"metric":"candidates","sf":"$sfDir","docs":$nDocs,"vecs":$nVecs,""" +
      s""""all_pairs_docs":$allPairsDocs,"q22_shingle_pairs":$q22,"q23_minhash_candidates":$q23,""" +
      s""""q24_simhash_band_candidates":$q24,"q24_band_candidates_cap100":$q24Capped,""" +
      s""""q50_test_shingle_probe_rows":$testShingles,"q50_train_vocab":$trainVocab,""" +
      s""""q56_bloom_mbits":$bloomM,"q56_bloom_positive_probe_rows":$bloomPos,""" +
      s""""q56_exact_hit_probe_rows":$exactHits,""" +
      s""""q67_distinct_chunks":$distinctChunks,"q67_chunks_removed":$q67Removed,""" +
      s""""q73_tfidf_pairs":$q73,"q78_global_minhash_candidates":$q78,""" +
      s""""q118_quantile_cap_candidates":$q118,"q120_banded_candidates":$q120,""" +
      s""""q120_banded_r4_candidates":$q120r4,"q118_5gram_candidates":$fiveGram,""" +
      s""""q124_banded_5gram_candidates":$q124CandN,"q124_verified_pairs":$q124Verified,""" +
      s""""q124_true_pairs":$q124True,""" +
      s""""q85_distinct_cdc_chunks":$q85DistinctChunks,"q85_cdc_chunk_rows":$q85ChunkRows,""" +
      s""""q85_chunks_removed":$q85Removed,""" +
      s""""all_pairs_vecs":$allPairsVecs,"q32_cell_lsh_candidates":$q32,""" +
      s""""q88_multitable_candidates":$q88,""" +
      s""""q61_sem_nodes":$semNodes,"q61_sem_components":$semComps,""" +
      s""""q61_occ_depth":$semDepth,"q61_occ_candidates":$semOccCand,""" +
      s""""q61_occ_pair_mass":$semOccMass,""" +
      s""""q53_cc_nodes":$ccNodes,"q53_cc_components":$ccComps,""" +
      s""""q111_star_edges":$q111Stars,"q111_new_batch_pairs":$q111NewPairs,""" +
      s""""q110_knn_candidate_rows":$q110Rows,"q106_match_rows":$q106Match,""" +
      s""""q112_recall_single_table":${math.rint(recall1 * 1000) / 1000},""" +
      s""""q112_recall_two_table":${math.rint(recall2 * 1000) / 1000},""" +
      s""""q117_tuned_tables":$tunedTables,"q117_tuned_planes":$tunedPlanes,""" +
      s""""q117_tuned_recall":$tunedRecall,"q117_tuned_candidate_pairs":$tunedCand,""" +
      s""""q141_tuned_bucket_occupancy":${math.rint(tunedOcc * 100) / 100},""" +
      s""""q141_fixed_1x2_bucket_occupancy":${math.rint(fixedOcc * 100) / 100},""" +
      s""""q141_tuned_candidates_per_query":$tunedCandPerQuery,""" +
      s""""q141_train_with_sweep_sec":${math.rint(trainSec * 1000) / 1000},""" +
      s""""q141_serve_from_artifact_sec":${math.rint(serveSec * 1000) / 1000},""" +
      s""""q141_serve_rows":$serveRows,""" +
      s""""q141_artifact_tables":${trainedIdx.tables},"q141_artifact_planes":${trainedIdx.planesPerTable},""" +
      s""""q143_bloom_mbits":${idx143.mBits},"q143_fresh_rows":$fresh143N,""" +
      s""""q143_bloom_positive_rows":$bloomPos143,"q143_true_dup_rows":$trueDup143,""" +
      s""""q158_postings_total":$q158Total,"q158_postings_query":$q158Query,""" +
      s""""q162_expanded_rows":$ex162Rows,"q162_weighted_candidates":$cand162N,""" +
      s""""q162_verified_pairs":$ver162,""" +
      s""""q161_fact_rows":$fact161,"q161_bloom_positive_rows":$pos161,""" +
      s""""q161_true_match_rows":$true161,""" +
      s""""q174_sampled_rows":$sampled174,"q174_standing_hist_rows":$hist174}""")
    spark.stop()
  }
}

/** Three-decade audit of the CALIBRATED dedup pipeline only — the q124
  * linearity claim rested on two 10× steps; this runs the identical plans
  * ([[ScaleAudit.calibratedFiveGramRows]]) on any tier, sized so the
  * 500k-doc heaps_sf10 decade is affordable: the measured-superlinear
  * fixed-cap baselines (q22/q23/q73/q78 — 22–92× growth at ONE decade on
  * Heaps vocabulary, SURVEY §6.1) are exactly what this entry point
  * SKIPS, because at 100× they would dominate the run while measuring a
  * quarantined opt-in path the front door no longer takes.
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=target/heaps_sf10 sbt "runMain graft.ScaleAuditCalibrated"
  * }}}
  */
object ScaleAuditCalibrated {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/heaps_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val allPairs = docs.groupBy("source").count()
      .agg(coalesce(sum(expr("count * (count - 1) DIV 2")), lit(0L))).head.getLong(0)
    val t0 = System.nanoTime()
    val rows = ScaleAudit.calibratedFiveGramRows(docs)
    val sec = (System.nanoTime() - t0) / 1e9
    val body = rows.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"calibrated_candidates","sf":"$sfDir","docs":$nDocs,""" +
      s""""all_pairs_docs":$allPairs,$body,""" +
      s""""wall_sec":${math.rint(sec * 1000) / 1000}}""")
    spark.stop()
  }
}

/** SimHash scale posture — the round-12 verdict #1 measurement: is the
  * BANDED simhash plan (7 bands × 9 bits) density-bounded on a REALISTIC
  * vocabulary, with the driver fixture's blow-up being corpus pathology?
  *
  * Reports, per tier: band-bucket count, max bucket size, the band-join
  * pair mass Σ C(n,2) over (bucket, band, bits) groups (= the self-join's
  * pre-aggregation row count — what [[DedupOps.simhashBandCandidates]]'
  * priced guard refuses on), uncapped candidate pairs, and maxBucket=100
  * capped pairs. The UNCAPPED count is only executed when the measured
  * mass is ≤ `maxCountMass` (default 500 M — above it the count IS the
  * blow-up; the row then reports candidates: null with the mass as the
  * diagnosis, the same priced-skip discipline as the production guard).
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=target/heaps_sf10 sbt "runMain graft.ScaleAuditSimhash"
  * }}}
  */
object ScaleAuditSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/heaps_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val maxCountMass = sys.env.getOrElse("SPARK_GRAFT_MAX_COUNT_MASS", "500000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val toks = docs.withColumn("tokset", array_distinct(TextOps.tokenize(col("text"))))
    val sigs = DedupOps.simhash63(toks.withColumn("bucket", col("source")),
      "doc_id", col("tokset"), Seq("bucket"))
    val bands = sigs.select(col("doc_id"), col("bucket"),
      posexplode(array((0 until 7).map(j => expr(s"(simhash >> ${9 * j}) & 511")): _*))
        .as(Seq("band", "bits")))
    val grp = bands.groupBy(col("bucket"), col("band"), col("bits"))
      .agg(count(lit(1)).as("n")).localCheckpoint(true)
    val stats = grp.agg(
      count(lit(1)).as("buckets"),
      max(col("n")).as("max_bucket"),
      coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L)).as("mass")).head
    val (buckets, maxBucket, mass) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    grp.unpersist(false)
    val t0 = System.nanoTime()
    val uncapped: Option[Long] =
      if (mass <= maxCountMass)
        Some(DedupOps.simhashBandCandidates(toks, "doc_id", col("tokset"), col("source"),
          bandMassBudget = 0L).count())
      else None
    val capped = DedupOps.simhashBandCandidates(toks, "doc_id", col("tokset"), col("source"),
      maxBucket = 100, bandMassBudget = 0L).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"simhash_posture","sf":"$sfDir","docs":$nDocs,""" +
      s""""band_buckets":$buckets,"max_bucket":$maxBucket,"band_join_mass":$mass,""" +
      s""""candidates":${uncapped.fold("null")(_.toString)},""" +
      s""""candidates_capped100":$capped,""" +
      s""""wall_sec":${math.rint(sec * 1000) / 1000}}""")
    spark.stop()
  }
}

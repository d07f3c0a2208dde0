package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** Semantics of the corpus-curation operators (hash split, quota sampling,
  * regex redaction). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private val cuts = Seq("train" -> 80, "valid" -> 90, "test" -> 100)

  test("split: assignment is a pure function of id — stable under corpus growth") {
    val small = (0L until 200L).toDF("doc_id")
    val grown = (0L until 2000L).toDF("doc_id")
    def assign(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("split", CurationOps.hashSplit(col("doc_id"), cuts))
      .as[(Long, String)].collect().toMap
    val before = assign(small)
    val after = assign(grown)
    // the leak-free property: growing the corpus never migrates an old doc
    assert(before.forall { case (id, s) => after(id) == s })
    // every label is populated and fractions are roughly as cut (±10pp)
    val frac = after.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1)
    assert(math.abs(frac("valid") - 0.1) < 0.1)
    assert(math.abs(frac("test") - 0.1) < 0.1)
  }

  test("quota: keeps at most k per group, deterministically, independent of partitioning") {
    val df = (0L until 500L).map(i => (i, s"g${i % 7}")).toDF("id", "grp")
    def kept(d: org.apache.spark.sql.DataFrame) = CurationOps
      .quotaSample(d, col("grp"), col("id"), 12)
      .as[(Long, String)].collect().toSet
    val a = kept(df.repartition(32))
    val b = kept(df.repartition(3, col("grp")))
    assert(a === b) // same kept set under any physical layout
    val perGroup = a.groupBy(_._2).view.mapValues(_.size)
    assert(perGroup.values.forall(_ == 12))
    // a group smaller than the quota survives whole
    val tiny = Seq((1L, "solo"), (2L, "solo")).toDF("id", "grp")
    assert(kept(tiny).size === 2)
  }

  test("redaction: counts every match across patterns and replaces them all") {
    val df = Seq(
      (1L, "the cat and a dog wrote to bob@example.com about the weather"),
      (2L, "nothing to redact here"),
      (3L, "a a a")).toDF("id", "text")
    val out = CurationOps.redact(df, col("text"),
      Seq("\\b(the|a)\\b" -> "<TOK>", "[A-Za-z0-9.]+@[A-Za-z0-9.]+" -> "<EMAIL>"))
      .select(col("id"), col("n_redactions"), col("text_redacted"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 === 4L) // the, a, the + one email
    assert(out(1L)._2 ===
      "<TOK> cat and <TOK> dog wrote to <EMAIL> about <TOK> weather")
    assert(out(2L) === ((0L, "nothing to redact here")))
    assert(out(3L) === ((3L, "<TOK> <TOK> <TOK>")))
  }

  test("packing: chunk = starting-offset bin; budget respected; groups independent") {
    // tokens: 3 docs of 1000 in g1 → offsets 0,1000,2000 → chunks 0,0,1 (budget 1500)
    val df = Seq((1L, "g1", 1000L), (2L, "g1", 1000L), (3L, "g1", 1000L), (9L, "g2", 5000L))
      .toDF("id", "grp", "tok")
    val out = CurationOps.packSequences(df, col("grp"), col("id"), col("tok"), 1500)
      .select(col("id"), col("chunk_id")).as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 9L -> 0L))
    // cumulative offsets restart per group: g2's oversized doc starts chunk 0
  }

  test("split plan: hash-split assignment is a narrow map — zero exchanges") {
    val df = spark.range(100).withColumnRenamed("id", "doc_id")
      .withColumn("split", CurationOps.hashSplit(col("doc_id"), cuts))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split introduced a shuffle:\n$plan")
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.contains("*("), s"split fell out of codegen:\n$plan")
  }

  test("redaction: counts reflect sequential replacement, not the original text") {
    // An earlier pattern consumes what a later one would match: the count
    // must be the number of replacements actually made (2), not the sum of
    // independent match counts on the original (4).
    val df = Seq((1L, "cat cat")).toDF("id", "text")
    val out = CurationOps.redact(df, col("text"), Seq("cat" -> "dog", "cat" -> "X"))
      .select(col("n_redactions"), col("text_redacted"))
      .as[(Long, String)].collect().head
    assert(out === ((2L, "dog dog")))
  }

  test("q50 plan: split filters sit below the shingle Generate (no wasted explode)") {
    import org.apache.spark.sql.execution.{FilterExec, GenerateExec}
    // The per-doc window blocks predicate pushdown, so the query must place
    // the split filter before shingleRows itself — otherwise the whole
    // corpus is tokenized, windowed, and then 90% discarded.
    val q50 = SparkEntry.queries("q50_decontamination")(spark, "/root/testdata/sf0.001")
    val gens = q50.queryExecution.sparkPlan.collect { case g: GenerateExec => g }
    assert(gens.nonEmpty)
    gens.foreach { g =>
      val hashFilterBelow = g.exists {
        case f: FilterExec => f.condition.toString.contains("conv(")
        case _ => false
      }
      assert(hashFilterBelow, s"split filter not below Generate:\n$g")
    }
  }

  test("reserved column names fail fast instead of silently dropping input columns") {
    val clashRk = Seq((1L, "g", 5)).toDF("id", "grp", "__rk")
    val eRk = intercept[IllegalArgumentException](
      CurationOps.quotaSample(clashRk, col("grp"), col("id"), 3))
    assert(eRk.getMessage.contains("__rk"))
    val clashRed = Seq((1L, "t", 9L)).toDF("id", "text", "n_redactions")
    val eRed = intercept[IllegalArgumentException](
      CurationOps.redact(clashRed, col("text"), Seq("a" -> "<A>")))
    assert(eRed.getMessage.contains("n_redactions"))
    val clashTok = Seq((1L, "g", 10, 3L)).toDF("id", "grp", "len", "n_tokens")
    val eTok = intercept[IllegalArgumentException](
      CurationOps.packSequences(clashTok, col("grp"), col("id"), col("len"), 100))
    assert(eTok.getMessage.contains("n_tokens"))
  }

  test("mixture: rate 100 keeps all, rate 0 keeps none, unknown sources drop") {
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val kept = CurationOps.mixtureSample(docs, col("source"), col("doc_id"),
        Seq("src0" -> 100, "src1" -> 0))
      .groupBy(col("source")).count()
      .as[(String, Long)].collect().toMap
    assert(kept === Map("src0" -> 100L)) // src1 sampled out, src2 not in the mixture
  }

  test("mixture: keep decision is per-document stable and independent of partitioning") {
    val docs = (0L until 1000L).map(i => (i, "s")).toDF("doc_id", "source")
    def keptIds(parts: Int) = CurationOps.mixtureSample(
        docs.repartition(parts), col("source"), col("doc_id"), Seq("s" -> 40))
      .select(col("doc_id")).as[Long].collect().toSet
    val a = keptIds(1)
    assert(a === keptIds(7))
    // ~40% within sampling noise, and growth never flips an old doc's bit
    assert(math.abs(a.size - 400) < 80)
    val grown = (0L until 5000L).map(i => (i, "s")).toDF("doc_id", "source")
    val after = CurationOps.mixtureSample(grown, col("source"), col("doc_id"), Seq("s" -> 40))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(a.forall(after.contains) && after.filter(_ < 1000L) == a)
  }

  test("mixture plan: binding source keeps rate 1.0, others scale to their share") {
    // src0: 1000 tokens, share 50 → ratio 20; src1: 100 tokens, share 25 →
    // ratio 4 (BINDING); src2: 400 tokens, share 25 → ratio 16.
    // B = 4 → planned = share*4: (200, 100, 100); rates (0.2, 1.0, 0.25).
    val docs = Seq(("src0", 1000L), ("src1", 100L), ("src2", 400L), ("ignored", 999L))
      .toDF("source", "n_tok")
    val got = CurationOps.mixturePlan(docs, col("source"), col("n_tok"),
        Seq("src0" -> 50, "src1" -> 25, "src2" -> 25))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map(
      "src0" -> ((1000L, 50L, 200L, 0.2)),
      "src1" -> ((100L, 25L, 100L, 1.0)),
      "src2" -> ((400L, 25L, 100L, 0.25))))
    assertThrows[IllegalArgumentException] {
      CurationOps.mixturePlan(docs, col("source"), col("n_tok"), Seq("a" -> 0))
    }
    assertThrows[IllegalArgumentException] {
      CurationOps.mixturePlan(docs, col("source"), col("n_tok"), Seq("a" -> 1, "a" -> 2))
    }
  }

  test("stratified split: exact eval count per stratum, deterministic, fail-fast on clash") {
    val docs = (1L to 40L).map(i => (i, if (i <= 25) "s0" else "s1")).toDF("id", "src")
    def run(parts: Int) = CurationOps
      .stratifiedEvalSplit(docs.repartition(parts), col("src"), col("id"), nEval = 4)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val a = run(1)
    // exactly 4 eval per stratum, and the assignment is partitioning-invariant
    assert(a.count { case (id, s) => id <= 25 && s == "eval" } === 4)
    assert(a.count { case (id, s) => id > 25 && s == "eval" } === 4)
    assert(run(7) === a)
    assertThrows[IllegalArgumentException] {
      CurationOps.stratifiedEvalSplit(
        docs.withColumn("split", lit("x")), col("src"), col("id"), 1)
    }
  }

  test("robust outliers: median/MAD per group and the count beyond k*MAD") {
    // g1 values: 1..9 plus 100 -> median 5.5, |dev| = 4.5,3.5,...,94.5 ->
    // MAD = median(0.5..4.5, 94.5) = 2.5; only 100 exceeds 5.5 + 3*2.5 = 13.
    val df = ((1 to 9).map(v => ("g1", v.toDouble)) :+ (("g1", 100.0)))
      .toDF("g", "v")
    val r = CurationOps.robustOutliers(df, col("g"), col("v"), k = 3.0)
      .collect().map(x => (x.getString(0), x.getDouble(1), x.getDouble(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq === Seq(("g1", 5.5, 2.5, 10L, 1L)))
  }

  test("contamination: exact containment fraction; unseen shingles score 0") {
    val evalSh = Seq((10L, "a b c"), (10L, "b c d"), (11L, "x y z")).toDF("doc_id", "sh")
    val trainSh = Seq((1L, "a b c"), (2L, "q r s")).toDF("doc_id", "sh")
    val out = CurationOps.contamination(evalSh, trainSh)
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) === ((2L, 1L))) // one of two shingles seen in train
    assert(out(11L) === ((1L, 0L)))
  }

  test("snapshot diff: added/removed/changed/unchanged by fingerprint") {
    val before = Seq((1L, "fa"), (2L, "fb"), (3L, "fc")).toDF("doc_id", "fp")
    val after = Seq((2L, "fb"), (3L, "fc2"), (4L, "fd")).toDF("doc_id", "fp")
    val r = CurationOps.snapshotDiff(before, after, col("doc_id"), col("fp"))
      .as[(String, Long)].collect().toMap
    assert(r === Map("removed" -> 1L, "unchanged" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("snapshot diff: presence markers, not fingerprint nullness, decide added/removed") {
    // doc 1 exists in BOTH snapshots but carries a null fingerprint in
    // `after` — must be 'changed' (unverifiable), never 'removed'; doc 2's
    // null-vs-null is also 'changed' (equality of unknown content is not
    // asserted), never 'unchanged'.
    val before = Seq((1L, Some("fa")), (2L, None), (3L, Some("fc"))).toDF("doc_id", "fp")
    val after = Seq((1L, Option.empty[String]), (2L, None), (3L, Some("fc"))).toDF("doc_id", "fp")
    val r = CurationOps.snapshotDiff(before, after, col("doc_id"), col("fp"))
      .as[(String, Long)].collect().toMap
    assert(r === Map("changed" -> 2L, "unchanged" -> 1L))
  }

  test("percentile calibration: per-group ranks in [0,1], ties share a rank, clash fails fast") {
    val df = Seq(("g1", 10, 1L), ("g1", 20, 2L), ("g1", 20, 3L), ("g1", 30, 4L),
      ("g2", 5, 5L)).toDF("g", "score", "id")
    val r = CurationOps.percentileCalibrate(df, col("g"), col("score"))
      .select(col("id"), col("score_pctile")).as[(Long, Double)].collect().toMap
    // g1 ranks over 4 rows: 10→0, the tied 20s→1/3 each, 30→1
    assert(r(1L) === 0.0)
    assert(r(2L) === 0.333333 && r(3L) === 0.333333)
    assert(r(4L) === 1.0)
    assert(r(5L) === 0.0) // singleton group
    assertThrows[IllegalArgumentException] {
      CurationOps.percentileCalibrate(
        df.withColumn("score_pctile", lit(0d)), col("g"), col("score"))
    }
  }

  test("log2 histogram: binary-magnitude buckets, true min/max, cumulative share") {
    // values 1 | 2,3 | 8,15 | 16 -> buckets 1,2,4,5; zero/negatives excluded
    val df = Seq(1L, 2L, 3L, 8L, 15L, 16L, 0L, -4L).toDF("v")
    val r = CurationOps.log2Histogram(df, col("v"))
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(r === Seq(
      (1L, 1L, 1L, 1L, 0.166667),
      (2L, 2L, 3L, 2L, 0.5),
      (4L, 8L, 15L, 2L, 0.833333),
      (5L, 16L, 16L, 1L, 1.0)))
  }

  test("pair-split audit: unordered split combinations, cross-split rows are the leaks") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a_id", "b_id")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "train"), (5L, "valid"), (6L, "train")).toDF("doc_id", "split")
    val r = CurationOps.pairSplitAudit(pairs, splits)
      .as[(String, String, Long)].collect().toSet
    // (1,2) and (2,3) both collapse to (test, train); (3,4) is within-train
    assert(r === Set(("test", "train", 2L), ("train", "train", 1L),
      ("train", "valid", 1L)))
  }

  test("semantic decontamination: eval near-twins of train vectors flag, clean evals report 0") {
    import graft.operators.SimilarityOps
    val rng = new scala.util.Random(31)
    def vec(): Array[Double] = Array.fill(16)(rng.nextGaussian())
    val t1 = vec(); val t2 = vec()
    val rows = Seq(
      (1L, t1, 0, "train"),
      (2L, t2, 0, "train"),
      (10L, t1, 0, "test"),                 // identical to train vec 1 → contaminated
      (11L, t1.map(-_), 0, "test"),         // antipodal → cosine −1, never over threshold
      (12L, t1, 1, "test")                  // identical but different CELL → invisible
    ).toDF("vec_id", "embedding", "label", "split")
    val got = CurationOps.semanticDecontamination(rows, "vec_id", col("embedding"),
        col("label"), col("split"), "test", "train",
        threshold = 0.9, tables = SimilarityOps.lshTables(2, 4, 16))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(10L) === ((1L, true)))
    assert(got(11L)._2 === false)
    assert(got(12L) === ((0L, false)))
    assert(got.size === 3, "every eval vector surfaces, contaminated or not")
  }

  test("pair-split audit: ids missing from the split table surface as 'unknown', not dropped") {
    val pairs = Seq((1L, 2L), (1L, 9L), (8L, 9L)).toDF("a_id", "b_id")
    val splits = Seq((1L, "train"), (2L, "test")).toDF("doc_id", "split")
    val r = CurationOps.pairSplitAudit(pairs, splits)
      .as[(String, String, Long)].collect().toSet
    // every pair is accounted for: 3 pairs in, 3 pairs out
    assert(r === Set(("test", "train", 1L), ("train", "unknown", 1L),
      ("unknown", "unknown", 1L)))
  }

  test("priority sample: exactly k rows; growth only displaces, never admits an old loser over an old winner") {
    val base = (0L until 100L).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    val grown = (0L until 150L).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    def kept(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      CurationOps.prioritySample(df, col("id"), col("w"), 20)
        .select(col("id")).as[Long].collect().toSeq
    val k0 = kept(base)
    val k1 = kept(grown)
    assert(k0.size === 20 && k1.size === 20)
    // Clocks are per-row-stable: an original row kept in the GROWN corpus
    // must also have been kept in the base corpus (new rows only displace).
    assert(k1.filter(_ < 100L).toSet.subsetOf(k0.toSet))
  }

  test("priority sample: a null or non-positive weight raises instead of silently winning the sample") {
    val bad = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "w")
    intercept[Exception] {
      CurationOps.prioritySample(bad, col("id"), col("w"), 2).collect()
    }
    val neg = Seq((1L, 2.0), (2L, -1.0)).toDF("id", "w")
    intercept[Exception] {
      CurationOps.prioritySample(neg, col("id"), col("w"), 2).collect()
    }
  }

  test("sliding chunks: stride == window reconstructs the document exactly") {
    val df = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val r = CurationOps.slidingChunks(df, col("doc_id"), col("text"), window = 3, stride = 3)
      .orderBy(col("doc_id"), col("chunk_id"))
      .as[(Long, Long, Long, String)].collect()
    // doc 1: chunks of 3,3,1 tokens; doc 2: one 2-token chunk
    assert(r.map(x => (x._1, x._2, x._3)).toSeq ===
      Seq((1L, 0L, 3L), (1L, 1L, 3L), (1L, 2L, 1L), (2L, 0L, 2L)))
    // overlap variant: stride 2 < window 3 — every token position is
    // covered by at least one chunk and consecutive chunks share a token
    val o = CurationOps.slidingChunks(df.filter(col("doc_id") === 1L),
        col("doc_id"), col("text"), window = 3, stride = 2)
      .as[(Long, Long, Long, String)].collect()
    assert(o.map(_._3).sum >= 7)
  }

  test("DSIR: target == corpus scores every document 0 (log-ratio of identical distributions)") {
    val df = Seq((1L, "a b c"), (2L, "b c d"), (3L, "e f")).toDF("doc_id", "text")
    val r = CurationOps.dsirScores(df, col("doc_id"), col("text"), lit(true))
      .as[(Long, Double)].collect().toMap
    assert(r.size === 3 && r.values.forall(_ === 0.0))
  }

  test("perplexity buckets: tertile labels partition the corpus ~evenly and respect score order") {
    val df = (1 to 90).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val r = CurationOps.perplexityBuckets(df, col("s"))
      .as[(Long, Double, String)].collect()
    val byB = r.groupBy(_._3).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byB.keySet === Set("head", "middle", "tail"))
    assert(byB("head").max < byB("middle").min)
    assert(byB("middle").max < byB("tail").min)
    assert(byB("head").size === 30 && byB("tail").size === 30)
  }

  test("X7: shuffleRank is the exact (md5(id), id) permutation — a bijection onto 1..n") {
    val df = (1 to 1000).toDF("id")
    val got = CurationOps.shuffleRank(df, col("id"))
      .select(col("id"), col("rank")).as[(Int, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq === (1L to 1000L)) // every rank exactly once
    // The bucketed+offset computation must equal the straight global sort.
    val want = (1 to 1000).map(i => (i, md5String(i))).sortBy { case (i, h) => (h, i) }
      .map(_._1)
    assert(got.map(_._1).toSeq === want)
  }

  test("X7: shardAssign cuts the shuffle order into fixed-size shards, last shard ragged") {
    val sharded = CurationOps.shardAssign((1 to 1042).toDF("id"), col("id"), 100)
    val sizes = sharded.groupBy("shard").count()
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(sizes.map(_._1).toSeq === (0L to 10L))
    assert(sizes.take(10).forall(_._2 == 100L) && sizes.last._2 === 42L)
    // Shard boundaries respect the global order: max rank of shard k is
    // below min rank of shard k+1.
    val bounds = sharded.groupBy("shard")
      .agg(min("rank").as("lo"), max("rank").as("hi"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    bounds.sliding(2).foreach { case Array((_, _, hi), (_, lo, _)) =>
      assert(hi < lo)
    }
  }

  test("X7: writeShards lands one readable directory per shard with the assigned rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/out"
    val sharded = CurationOps.shardAssign((1 to 250).toDF("id"), col("id"), 100)
    CurationOps.writeShards(sharded, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 250L)
    assert(back.select("shard").distinct().count() === 3L)
    // Round-trip preserves the assignment exactly (partition column included).
    val a = sharded.select(col("id"), col("shard")).as[(Int, Long)].collect().toSet
    val b = back.select(col("id"), col("shard").cast("long")).as[(Int, Long)].collect().toSet
    assert(a === b)
    // The ORDER contract: rows inside each shard file are laid out in rank
    // order, so streaming the files replays the exact global permutation.
    // Each shard is one task's whole output = one parquet data file; reading
    // that single small file is one partition, so collect() preserves the
    // file's physical row order.
    val rankById = sharded.select(col("id"), col("rank")).as[(Int, Long)].collect().toMap
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length === 3)
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${sd.getName}: one writer task per shard")
      val fileOrder = spark.read.parquet(files.head.getAbsolutePath)
        .select(col("id")).as[Int].collect().toSeq
      val ranks = fileOrder.map(rankById)
      assert(ranks === ranks.sorted, s"${sd.getName}: file order must equal rank order")
    }
  }

  test("X7: groupedShuffleRank is a per-group bijection onto 1..|group|") {
    val df = (1 to 500).map(i => (i, i % 3)).toDF("id", "g")
    val got = CurationOps.groupedShuffleRank(df, col("g"), col("id"))
      .groupBy(col("g")).agg(
        org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.min("rank").as("lo"),
        org.apache.spark.sql.functions.max("rank").as("hi"),
        org.apache.spark.sql.functions.countDistinct("rank").as("d"))
      .as[(Int, Long, Long, Long, Long)].collect()
    got.foreach { case (_, n, lo, hi, d) =>
      assert(lo === 1L && hi === n && d === n)
    }
  }

  test("X7: batchPadWaste — hand case: padded mass is n·max per batch, ragged last batch") {
    // One group, 5 docs, batchSize 2 → batches of 2, 2, 1.
    val df = Seq((1, 10L), (2, 20L), (3, 30L), (4, 40L), (5, 50L)).toDF("id", "tok")
    val r = CurationOps.batchPadWaste(df, lit(0L), col("id"), col("tok"), 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    val (_, nBatches, nDocs, total, padded, waste) = r
    assert(nBatches === 3L && nDocs === 5L && total === 150L)
    // Independently recompute padded mass from the md5 order.
    val order = Seq(1, 2, 3, 4, 5).sortBy(i => (md5String(i), i))
    val toks = order.map(i => i * 10L)
    val wantPadded = toks.grouped(2).map(b => b.size * b.max).sum
    assert(padded === wantPadded)
    assert(math.abs(waste - (1.0 - total.toDouble / padded.toDouble)) < 1e-6)
  }

  test("X7: length bucketing never costs more padded tokens than batching the raw order") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map(i => (i, 5L + rnd.nextInt(200).toLong)).toDF("id", "tok")
    val bucketed = CurationOps.batchPadWaste(
      df.withColumn("g", (col("tok") / 50).cast("long")),
      col("g"), col("id"), col("tok"), 16)
      .agg(org.apache.spark.sql.functions.sum("padded_tokens")).as[Long].head()
    val baseline = CurationOps.batchPadWaste(df, lit(-1L), col("id"), col("tok"), 16)
      .select("padded_tokens").as[Long].head()
    assert(bucketed < baseline,
      s"bucketed padded $bucketed should beat raw-order padded $baseline")
  }

  test("X7: shuffleRank refuses a null id loudly instead of silently dropping the row") {
    val df = Seq(Some(1), Some(2), None).toDF("id")
    val e = intercept[Exception] {
      CurationOps.shuffleRank(df, col("id")).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("must be non-null")), s"got: $e")
  }

  test("X7: groupedShuffleRank keeps a NULL group as its own group instead of dropping it") {
    val df = Seq((1, Some("a")), (2, Some("a")), (3, None), (4, None))
      .toDF("id", "g")
    val got = CurationOps.groupedShuffleRank(df, col("g"), col("id"))
    assert(got.count() === 4L) // nothing vanished in the offsets join
    val nullRanks = got.filter(col("g").isNull)
      .select("rank").as[Long].collect().sorted
    assert(nullRanks.toSeq === Seq(1L, 2L)) // its own 1..n rank space
  }

  test("X7: temperature mixture flattens a head-heavy source mix (α = 1/2 law)") {
    // 3 sources with token mass 90k / 9k / 1k.
    val rows = Seq.fill(90)(("big", 1000L)) ++ Seq.fill(9)(("mid", 1000L)) ++
      Seq(("small", 1000L))
    val r = CurationOps.temperatureMixture(
      rows.toDF("source", "tok"), col("source"), col("tok"), budgetTokens = 100000L)
      .as[(String, Long, Double, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    // Probabilities follow sqrt mass: 300/141.4 ratio ~ sqrt(90/9) ≈ 3.16,
    // not the raw 10x — the flattening the knob exists for.
    val pBig = r("big")._3; val pMid = r("mid")._3; val pSmall = r("small")._3
    assert(math.abs(pBig / pMid - math.sqrt(10.0)) < 0.01)
    assert(math.abs(pMid / pSmall - math.sqrt(9.0)) < 0.01)
    assert(math.abs((pBig + pMid + pSmall) - 1.0) < 1e-4)
    // The small source is upsampled (epochs > 1), the big one downsampled.
    assert(r("small")._5 > 1.0 && r("big")._5 < 1.0)
  }

  test("X7: general-α mixture — α = 1 is proportional, α → 0 flattens toward uniform, " +
    "and the pinned α = 1/2 entry point is the dyadic path bit-for-bit") {
    val rows = Seq.fill(90)(("big", 1000L)) ++ Seq.fill(9)(("mid", 1000L)) ++
      Seq(("small", 1000L))
    val df = rows.toDF("source", "tok")
    def probs(num: Int, log2den: Int): Map[String, Double] =
      CurationOps.temperatureMixtureAlpha(df, col("source"), col("tok"),
          budgetTokens = 100000L, alphaNum = num, alphaLog2Den = log2den)
        .select(col("source"), col("sample_p"))
        .as[(String, Double)].collect().toMap
    // α = 1 (k=1, m=0): proportional allocation — raw 90/9/1 shares.
    val p1 = probs(1, 0)
    assert(math.abs(p1("big") - 0.9) < 1e-4 && math.abs(p1("small") - 0.01) < 1e-4)
    // α = 3/8: big/mid ratio = 10^(3/8), between uniform and proportional.
    val p38 = probs(3, 3)
    assert(math.abs(p38("big") / p38("mid") - math.pow(10.0, 3.0 / 8.0)) < 0.01)
    // Monotone flattening: dispersion shrinks as α falls toward 0.
    val spread = Seq(probs(1, 0), probs(1, 1), probs(1, 2), probs(1, 4), probs(1, 6))
      .map(p => p("big") / p("small"))
    assert(spread === spread.sorted.reverse, s"spread must fall with α: $spread")
    assert(spread.last < 1.2, s"α = 1/64 must be near-uniform, ratio ${spread.last}")
    // The α = 1/2 entry point IS the general path at (1, 1) — bit-identical.
    val pinned = CurationOps.temperatureMixture(df, col("source"), col("tok"), 100000L)
      .as[(String, Long, Double, Long, Double)].collect().toSet
    val dyadic = CurationOps.temperatureMixtureAlpha(df, col("source"), col("tok"),
        100000L, alphaNum = 1, alphaLog2Den = 1)
      .as[(String, Long, Double, Long, Double)].collect().toSet
    assert(pinned === dyadic)
  }

  test("X7: groupedTokenPrefixSum equals the whole-group window, keeps a NULL group, " +
    "and raises on a NULL id") {
    val df = (1 to 400).map(i => (i, if (i % 5 == 0) None else Some(s"s${i % 3}"), (i % 7 + 1).toLong))
      .toDF("id", "g", "tok")
    val got = CurationOps.groupedTokenPrefixSum(df, col("g"), col("id"), col("tok"))
      .select(col("id"), col("g"), col("cum_tokens"))
      .as[(Int, Option[String], Long)].collect()
    assert(got.length === 400) // nothing vanished, NULL group included
    // Brute-force: per group, (md5, id) order, running inclusive sum.
    val want = (1 to 400).map(i => (i, if (i % 5 == 0) None else Some(s"s${i % 3}"), (i % 7 + 1).toLong))
      .groupBy(_._2)
      .flatMap { case (_, rows) =>
        rows.sortBy { case (i, _, _) => (md5String(i), i) }
          .scanLeft((0, Option.empty[String], 0L)) { case ((_, _, acc), (i, g, t)) => (i, g, acc + t) }
          .drop(1)
      }
      .map { case (i, _, c) => i -> c }.toMap
    got.foreach { case (i, _, c) => assert(c === want(i), s"id $i") }
    val err = intercept[Exception] {
      CurationOps.groupedTokenPrefixSum(
        Seq((Some(1), "g", 1L), (None, "g", 2L)).toDF("id", "g", "tok"),
        col("g"), col("id"), col("tok")).collect()
    }
    assert(err.getMessage.contains("non-null"))
    // A NULL weight is refused (silently rides at 0) — and so is a
    // NEGATIVE one, which would deflate cum_tokens and over-admit mass
    // past planned_tokens downstream in materializeMixture.
    Seq(("null weight", Seq((1, "g", Some(1L)), (2, "g", Option.empty[Long]))),
      ("negative weight", Seq((1, "g", Some(1L)), (2, "g", Some(-5L))))).foreach {
      case (label, rows) =>
        val bad = intercept[Exception] {
          CurationOps.groupedTokenPrefixSum(rows.toDF("id", "g", "tok"),
            col("g"), col("id"), col("tok")).collect()
        }
        assert(bad.getMessage.contains("non-negative"), label)
    }
  }

  test("X7: materializeMixture admits each source's md5-order prefix up to its budget, " +
    "never over, and admits everything when the budget covers the corpus") {
    val df = (1 to 300).map(i => (i, s"s${i % 2}", 10L)).toDF("id", "src", "tok")
    val plan = Seq(("s0", 420L), ("s1", 100000L)).toDF("source", "planned_tokens")
    val sel = CurationOps.materializeMixture(df, col("src"), col("id"), col("tok"), plan)
      .select(col("source"), col("id"), col("cum_tokens"))
      .as[(String, Int, Long)].collect()
    val byS = sel.groupBy(_._1)
    // s0: 10-token docs against a 420 budget -> exactly the 42-doc prefix.
    assert(byS("s0").length === 42)
    assert(byS("s0").map(_._3).max === 420L)
    // ...and it IS the md5-order prefix, not an arbitrary 42 docs.
    val s0Order = (1 to 300).filter(_ % 2 == 0)
      .sortBy(i => (md5String(i), i)).take(42).toSet
    assert(byS("s0").map(_._2).toSet === s0Order)
    // s1: budget exceeds the corpus -> all 150 docs admitted.
    assert(byS("s1").length === 150)
  }

  test("X7: materializeMixtureEpochs emits full copies plus the remainder prefix, " +
    "exact mass f*A + prefix(B mod A), and degenerates to the single-epoch form") {
    // Source a: 3 docs x 10 tokens (A = 30), budget 75 -> f = 2 full epochs
    // (6 rows) + remainder 15 admits exactly the first md5-order doc as
    // epoch 2. Source b: budget 20 < A -> single partial epoch 0.
    val df = Seq((1, "a", 10L), (2, "a", 10L), (3, "a", 10L),
      (11, "b", 10L), (12, "b", 10L), (13, "b", 10L)).toDF("id", "src", "tok")
    val plan = Seq(("a", 75L), ("b", 20L)).toDF("source", "planned_tokens")
    val got = CurationOps.materializeMixtureEpochs(
        df, col("src"), col("id"), col("tok"), plan)
      .select(col("source"), col("id"), col("epoch"))
      .as[(String, Int, Long)].collect()
    val a = got.filter(_._1 == "a")
    assert(a.count(_._3 == 0L) === 3 && a.count(_._3 == 1L) === 3) // full epochs
    val aPartial = a.filter(_._3 == 2L)
    assert(aPartial.length === 1)
    assert(aPartial.head._2 === Seq(1, 2, 3).minBy(i => (md5String(i), i))) // md5-order head
    assert(a.length === 7) // mass 70 = 2*30 + 10 <= 75
    val b = got.filter(_._1 == "b")
    assert(b.forall(_._3 == 0L) && b.length === 2) // 20-token prefix, no full copies
    assert(b.map(_._2).toSet ===
      Seq(11, 12, 13).sortBy(i => (md5String(i), i)).take(2).toSet)
  }

  test("X7: duplicate ids still receive DISTINCT consecutive ranks (ROWS frame, " +
    "not RANGE peers) — the bijection survives key collisions") {
    // Three copies of id 7 among 1..50: a RANGE-frame running total would
    // give all three the same rank (the combined mass) and skip two ranks.
    val df = ((1 to 50) ++ Seq(7, 7)).toDF("id")
    val ranks = CurationOps.shuffleRank(df, col("id"))
      .select("rank").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 52L)) // every rank exactly once
    // And the weighted form: each duplicate carries its own weight step.
    val cum = CurationOps.groupedTokenPrefixSum(
        ((1 to 10) ++ Seq(3, 3)).map((_, 5L)).toDF("id", "tok"),
        lit("g"), col("id"), col("tok"))
      .select("cum_tokens").as[Long].collect().sorted
    assert(cum.toSeq === (1L to 12L).map(_ * 5L))
  }

  test("X7: stratifiedShardAssign balances every stratum across shards within 1, " +
    "and each cell holds the stratum's round-robin ranks") {
    // 3 sources with counts 100 / 47 / 5 over 7 shards: 100 = 7*14+2 and
    // 47 = 7*6+5 are NOT divisible — balance must still hold within 1.
    val df = ((1 to 100).map(i => (i, "big")) ++ (101 to 147).map(i => (i, "mid")) ++
      (148 to 152).map(i => (i, "small"))).toDF("id", "src")
    val got = CurationOps.stratifiedShardAssign(df, col("src"), col("id"), nShards = 7)
      .select(col("src"), col("id"), col("rank"), col("shard"))
      .as[(String, Int, Long, Long)].collect()
    assert(got.length === 152)
    got.groupBy(_._1).foreach { case (srcName, rows) =>
      val counts = rows.groupBy(_._4).values.map(_.size)
      assert(counts.max - counts.min <= 1, s"$srcName imbalance: $counts")
      // the assignment IS round-robin on the within-stratum rank
      rows.foreach { case (_, _, r, sh) => assert(sh === (r - 1) % 7) }
    }
    // small source (5 docs over 7 shards): five distinct shards 0..4
    assert(got.filter(_._1 == "small").map(_._4).sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("robustOutliers: hand case, MAD=0 degenerate, and z gate") {
    import spark.implicits._
    // g1: values 1..9 plus a 1000 tail -> med 5.5, deviations {0.5..4.5, 994.5}
    //     sorted devs: .5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 -> mad 2.5
    //     outliers: |x-5.5| > 3.5*2.5 = 8.75 -> only 1000.
    // g2: nine 7s and one 9 -> med 7, mad 0 -> degenerate: any x != med flags.
    val rows = ((1 to 9).map(v => ("g1", v.toDouble)) :+ ("g1", 1000d)) ++
      ((1 to 9).map(_ => ("g2", 7d)) :+ ("g2", 9d))
    val got = graft.operators.CurationOps
      .robustOutliers(rows.toDF("g", "v"), "g", col("v"), z = 3.5)
      .as[(String, Long, Double, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("g1", 10L, 5.5, 2.5, 1L), ("g2", 10L, 7.0, 0.0, 1L)))
  }

  test("psiDrift: identical snapshots ~0, disjoint mass drifts, unpaired group absent") {
    import spark.implicits._
    import graft.operators.CurationOps
    // g1: ref and cur identical bin histograms -> psi == 0 exactly (every
    //     smoothed term pr == pc). g2: fully disjoint bins -> large psi.
    // g3: only a ref snapshot -> no pairing, absent from output.
    val rows =
      (1 to 10).flatMap(i => Seq(("g1", "ref", i % 3), ("g1", "cur", i % 3))) ++
      (1 to 10).map(i => ("g2", "ref", 1)) ++ (1 to 10).map(i => ("g2", "cur", 2)) ++
      (1 to 5).map(i => ("g3", "ref", 1))
    val got = CurationOps.psiDrift(rows.toDF("g", "snap", "bin"),
      "g", col("snap"), col("bin"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === Set("g1", "g2"))
    assert(got("g1") === ((0.0, 0L)))
    assert(got("g2")._1 > 2.0 && got("g2")._2 === 1L)
  }

  test("groupedExactMedian ignores NULL values (median semantics), all-null group absent") {
    import spark.implicits._
    val df = Seq(("g1", Some(1.0)), ("g1", Some(2.0)), ("g1", None),
      ("g2", None)).toDF("g", "v")
    val got = graft.operators.CurationOps.groupedExactMedian(df, "g", col("v"))
      .as[(String, Double)].collect().toMap
    assert(got === Map("g1" -> 1.5))
  }

  test("robustStatsWeighted: histogram form is bit-identical to the row form; " +
      "bad weights refuse") {
    import spark.implicits._
    import graft.operators.CurationOps
    // Deterministic pseudo-random multiset with repeats and two groups —
    // the histogram (value, weight) form must reproduce the ROW form's
    // (med, mad) bit-for-bit (shared medianFromCounts tail).
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map(i =>
      (if (i % 3 == 0) "a" else "b", (rng.nextInt(25) + 1).toDouble))
    val rowStats = CurationOps.robustOutliers(rows.toDF("g", "v"), "g", col("v"))
      .select(col("g"), col("med"), col("mad"))
      .as[(String, Double, Double)].collect().sortBy(_._1).toSeq
    val hist = rows.groupBy(identity).map { case ((g, v), xs) => (g, v, xs.size.toLong) }
      .toSeq.toDF("g", "v", "w")
    val histStats = CurationOps.robustStatsWeighted(hist, "g", col("v"), col("w"))
      .select(col("g"), col("med"), col("mad"))
      .as[(String, Double, Double)].collect().sortBy(_._1).toSeq
    assert(histStats === rowStats)
    // weight 0 / null weights are histogram bugs, not data — refuse loudly
    intercept[Exception] {
      CurationOps.groupedExactMedianWeighted(
        Seq(("a", 1.0, 0L)).toDF("g", "v", "w"), "g", col("v"), col("w")).collect()
    }
    intercept[Exception] {
      CurationOps.groupedExactMedianWeighted(
        Seq(("a", 1.0, Option.empty[Long])).toDF("g", "v", "w"),
        "g", col("v"), col("w")).collect()
    }
  }

  test("ruleFunnel: gross vs sole-fail attribution, NULL rule fails, refusals") {
    // doc layout per (grp, a, b):
    //   g1: (T,T) admitted; (F,T) sole-fails a; (F,F) fails both, sole neither
    //   g2: (T,F) sole-fails b; (T, NULL) NULL counts as failed -> sole-fails b
    val df = Seq(
      ("g1", true, Some(true)), ("g1", false, Some(true)), ("g1", false, Some(false)),
      ("g2", true, Some(false)), ("g2", true, None)).toDF("g", "a", "b")
    val got = CurationOps.ruleFunnel(df, col("g"),
        Seq("a" -> col("a"), "b" -> col("b")))
      .orderBy("grp", "rule")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("g1", "a", 3L, 1L, 2L, 1L),
      ("g1", "b", 3L, 1L, 1L, 0L),
      ("g2", "a", 2L, 0L, 0L, 0L),
      ("g2", "b", 2L, 0L, 2L, 2L)))
    intercept[IllegalArgumentException] {
      CurationOps.ruleFunnel(df, col("g"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      CurationOps.ruleFunnel(df, col("g"),
        Seq("a" -> col("a"), "a" -> col("b")))
    }
  }

  test("domainGate: rate boundary is integer-exact, thin domains drop whole, NULL fails") {
    // d1: 3 docs, 2 pass = 66% < 70 -> domain rejected (passing docs too)
    // d2: 3 docs, 2 pass + 1 NULL-pass treated as fail -> still 66%... use:
    // d2: 10 docs, 7 pass = 70% = threshold -> admitted (>= is inclusive)
    // d3: 2 docs, 2 pass -> under minDocs=3, dropped whole
    val rows =
      Seq(("d1", 1L, true), ("d1", 2L, true), ("d1", 3L, false)) ++
        (1L to 7L).map(i => ("d2", 10L + i, true)) ++
        Seq(("d2", 18L, false), ("d2", 19L, false), ("d2", 20L, false)) ++
        Seq(("d3", 30L, true), ("d3", 31L, true))
    val got = CurationOps.domainGate(rows.toDF("dom", "doc_id", "p"),
        col("dom"), col("p"), minRatePct = 70, minDocs = 3)
      .select(col("dom"), col("doc_id"), col("doc_pass"),
        col("domain_admitted"), col("admitted"))
      .as[(String, Long, Long, Long, Long)].collect()
    val byDom = got.groupBy(_._1)
    // d1 rejected: 66.7% < 70 even though docs 1,2 pass individually
    assert(byDom("d1").forall(r => r._4 === 0L && r._5 === 0L))
    assert(byDom("d1").count(_._3 === 1L) === 2)
    // d2 admitted at exactly 70%: passing docs admitted, failing ones not
    assert(byDom("d2").forall(_._4 === 1L))
    assert(byDom("d2").count(_._5 === 1L) === 7)
    // d3 dropped whole on minDocs despite 100% pass rate
    assert(byDom("d3").forall(r => r._4 === 0L && r._5 === 0L))
    // NULL docPass counts as fail, never NULL-poisons the aggregate
    val withNull = Seq(("dn", 1L, Some(true)), ("dn", 2L, Option.empty[Boolean]),
      ("dn", 3L, Some(true))).toDF("dom", "doc_id", "p")
    val gotN = CurationOps.domainGate(withNull, col("dom"), col("p"),
        minRatePct = 60, minDocs = 1)
      .select(col("doc_id"), col("doc_pass"), col("admitted"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(gotN.map(_._2).toSeq === Seq(1L, 0L, 1L)) // 2/3 = 66% >= 60 -> admitted
    assert(gotN.map(_._3).toSeq === Seq(1L, 0L, 1L))
    intercept[IllegalArgumentException] {
      CurationOps.domainGate(rows.toDF("dom", "doc_id", "admitted"),
        col("dom"), col("doc_id") > 0, 50)
    }
    intercept[IllegalArgumentException] {
      CurationOps.domainGate(rows.toDF("dom", "doc_id", "p"), col("dom"), col("p"), 101)
    }
  }

  test("temperatureMixtureEffective: no dups degenerates to the raw plan; dup mass deflates its source") {
    val allBuckets = "0123456789abcdef".map(_.toString)
    // all fingerprints distinct -> est = 0 everywhere -> effective == raw
    val clean = Seq(
      ("a", 100L, "f1"), ("a", 300L, "f2"), ("b", 900L, "f3"))
      .toDF("source", "nt", "fp")
    val eff = CurationOps.temperatureMixtureEffective(clean, col("source"),
        col("nt"), col("fp"), allBuckets, budgetTokens = 10000L)
      .select(col("source"), col("avail_tokens"), col("sample_p"),
        col("planned_tokens"), col("epochs"))
      .as[(String, Long, Double, Long, Double)].collect().sortBy(_._1)
    val raw = CurationOps.temperatureMixture(clean, col("source"), col("nt"),
        budgetTokens = 10000L)
      .as[(String, Long, Double, Long, Double)].collect().sortBy(_._1)
    assert(eff.toSeq === raw.toSeq)
    // source "a": 4 docs sharing one fingerprint -> est = 1 - 1/4 = 0.75,
    // eff = 400*0.25 = 100 = source "b"'s clean mass -> equal shares.
    val dup = Seq(
      ("a", 100L, "d1"), ("a", 100L, "d1"), ("a", 100L, "d1"), ("a", 100L, "d1"),
      ("b", 100L, "u1")).toDF("source", "nt", "fp")
    val got = CurationOps.temperatureMixtureEffective(dup, col("source"),
        col("nt"), col("fp"), allBuckets, budgetTokens = 1000L)
      .select(col("source"), col("est_dup_rate"), col("eff_tokens"), col("sample_p"))
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    assert(got(0) === (("a", 0.75, 100.0, 0.5)))
    assert(got(1) === (("b", 0.0, 100.0, 0.5)))
    intercept[IllegalArgumentException] {
      CurationOps.temperatureMixtureEffective(dup, col("source"), col("nt"),
        col("fp"), Seq.empty, 1000L)
    }
    intercept[IllegalArgumentException] {
      CurationOps.temperatureMixtureEffective(dup, col("source"), col("nt"),
        col("fp"), allBuckets, 0L)
    }
  }

  test("temperatureMixtureEffective: zero total effective mass and null fp are refused loudly (round-11 advice)") {
    def messageChain(t: Throwable): String =
      Iterator.iterate[Throwable](t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val allBuckets = "0123456789abcdef".map(_.toString)
    // every source's effective mass 0 (zero-token docs): the normalizer
    // would divide 0/0 — previously an engine-version-dependent NaN/NULL
    // fork (DuckDB needs ieee_floating_point_ops for NaN); now a named
    // refusal on BOTH sides.
    val zeroMass = Seq(("a", 0L, "f1"), ("b", 0L, "f2")).toDF("source", "nt", "fp")
    val eZero = intercept[Exception] {
      CurationOps.temperatureMixtureEffective(zeroMass, col("source"),
        col("nt"), col("fp"), allBuckets, 1000L).collect()
    }
    assert(messageChain(eZero).contains("effective token mass is zero"))
    // a null fingerprint would skew r̂ invisibly — refused by name
    val withNull = Seq(("a", 10L, "f1"), ("a", 10L, null))
      .toDF("source", "nt", "fp")
    val eNull = intercept[Exception] {
      CurationOps.temperatureMixtureEffective(withNull, col("source"),
        col("nt"), col("fp"), allBuckets, 1000L).collect()
    }
    assert(messageChain(eNull).contains("fp must be non-null"))
  }

  private def md5String(i: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
}

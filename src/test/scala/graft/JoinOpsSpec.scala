package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoinBackward matches latest at-or-before right row, null when none") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 50L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 15L, 901L), (2L, 6L, 902L))
      .toDF("k", "rt", "rv")
    val got = JoinOps.asofJoinBackward(left, right, "k", "t", "rt", Seq("rv"))
      .select(col("lid"), col("rv_asof")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(100L) === Some(900L)) // equal time is inclusive
    assert(got(101L) === Some(901L)) // latest of two predecessors
    assert(got(102L) === None) // right row is in the future
    assert(got(103L) === None) // no right rows for key 3
    assert(got.size === 4) // left-outer: row count preserved
  }

  test("asofJoinBackward returns the MATCHED row's null payload, not an older non-null one") {
    // DuckDB ASOF LEFT JOIN semantics: the latest at-or-before right row is
    // the match even when its payload value is NULL — a per-column
    // last(ignoreNulls) would wrongly carry the older 900 forward.
    val left = Seq((1L, 20L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, Some(900L)), (1L, 15L, None))
      .toDF("k", "rt", "rv")
    val got = JoinOps.asofJoinBackward(left, right, "k", "t", "rt", Seq("rv"))
      .select(col("lid"), col("rv_asof")).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 100L)
    assert(got(0).isNullAt(1), "matched row's null payload must propagate")
  }

  test("rangeJoinByBucket equals the naive range join across bucket boundaries") {
    val left = (0L until 50L).map(i => (i % 3, i * 7L, i)).toDF("k", "t", "lid")
    val right = (0L until 80L).map(j => (j % 3, j * 5L + 2L, j)).toDF("k", "rt", "rid")
    val (lo, hi) = (1L, 40L)
    val bucketed = JoinOps.rangeJoinByBucket(left, right, "k", "t", "rt", lo, hi)
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right, Seq("k"))
      .filter(col("rt") >= col("t") + lo && col("rt") <= col("t") + hi)
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("bloomReducedJoin equals the plain inner join; nulls never match") {
    val big = (0L until 200L).map(i => (i % 40, i)).toDF("k", "v")
      .unionByName(Seq((Option.empty[Long], 999L)).toDF("k", "v"))
    val small = Seq((3L, "a"), (7L, "b"), (7L, "b2"), (1000L, "c"))
      .toDF("sk", "label")
      .unionByName(Seq((Option.empty[Long], "nul")).toDF("sk", "label"))
    val got = JoinOps.bloomReducedJoin(big, "k", small, "sk")
      .select(col("v"), col("label")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = big.join(small, big("k") === small("sk"))
      .select(col("v"), col("label")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === plain)
    assert(plain.exists(_._2 == "b2"), "duplicate dim keys must fan out")
    assert(!plain.exists(_._1 == 999L), "null big key must not match")
    // the key set's sliver is what survives the prefilter: exact selectivity
    // plus a bounded false-positive tail (fp ~ 2^-k at design load; assert a
    // loose 10x margin so the test stays deterministic, not distributional)
    import graft.functions.GraftFunctions
    import graft.operators.DedupOps
    val keys = small.select(col("sk")).filter(col("sk").isNotNull).distinct()
    val idx = DedupOps.buildFingerprintBloom(keys, col("sk"))
    val survivors = big.filter(
      GraftFunctions.bloomContains(col("k").cast("string"), idx.sketch, idx.k)).count()
    val trueMatches = big.join(keys, big("k") === keys("sk"), "left_semi").count()
    assert(survivors >= trueMatches, "blooms must have no false negatives")
    assert(survivors <= trueMatches + (200 - trueMatches) / 10 + 1,
      s"prefilter admitted $survivors rows for $trueMatches true matches")
  }

  test("bloomReducedJoin with an empty dim returns an empty frame") {
    val big = (0L until 10L).map(i => (i, i)).toDF("k", "v")
    val small = Seq.empty[(Long, String)].toDF("sk", "label")
    assert(JoinOps.bloomReducedJoin(big, "k", small, "sk").count() === 0L)
  }

  test("bloomReducedJoin refuses mismatched key types and USING collisions") {
    // INT 3 vs DOUBLE 3.0 render "3" vs "3.0": the plain join would coerce
    // and match, the sketch would not — a silent false negative, so the
    // operator must refuse the shape rather than return a wrong answer.
    val big = Seq((3L, 1L)).toDF("k", "v")
    val small = Seq((3.0, "a")).toDF("sk", "label")
    val e = intercept[IllegalArgumentException] {
      JoinOps.bloomReducedJoin(big, "k", small, "sk")
    }
    assert(e.getMessage.contains("types must match"))
    // a small side already carrying a column named like big's key would make
    // the USING rename ambiguous at plan time — refuse with a message
    val clash = Seq((3L, 9L, "a")).toDF("sk", "k", "label")
    val e2 = intercept[IllegalArgumentException] {
      JoinOps.bloomReducedJoin(big, "k", clash, "sk")
    }
    assert(e2.getMessage.contains("collide"))
  }
}

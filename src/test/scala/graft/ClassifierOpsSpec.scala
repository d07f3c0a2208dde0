package graft

import graft.operators.ClassifierOps
import org.apache.spark.sql.functions._

/** Laws of the in-engine logistic-regression quality filter (q109):
  * separable recovery, monotone convergence, standardization fold-back,
  * and the scoring expression against a hand sigmoid. */
class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  test("X7: separable data trains to accuracy 1.0 with a positive signal weight") {
    val df = Seq((-2.0, false), (-1.5, false), (-1.0, false),
      (1.0, true), (1.5, true), (2.0, true)).toDF("x", "y")
    val w = ClassifierOps.logisticTrain(df, Seq(col("x")), col("y"), lr = 1.0, iters = 100)
    assert(w.head > 0) // +x predicts the positive class
    val right = df
      .withColumn("p", ClassifierOps.score(Seq(col("x")), w))
      .filter((col("p") > 0.5) === col("y")).count()
    assert(right === 6L)
  }

  test("X7: rows with a null feature or label are dropped as whole rows (complete-case)") {
    val clean = Seq((-2.0, false), (-1.0, false), (1.0, true), (2.0, true))
    val dirty = clean.map { case (x, y) => (Some(x), Some(y)) } ++
      Seq((None: Option[Double], Some(true)), (Some(9.0), None: Option[Boolean]))
    val wClean = ClassifierOps.logisticTrain(
      clean.toDF("x", "y"), Seq(col("x")), col("y"), 1.0, 30)
    val wDirty = ClassifierOps.logisticTrain(
      dirty.toDF("x", "y"), Seq(col("x")), col("y"), 1.0, 30)
    // Null-bearing rows must not skew n, the standardization, or the
    // gradient — training on the dirty frame equals training on the clean.
    wClean.zip(wDirty).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("X7: log-loss starts at ln 2 for zero iterations and decreases with training") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (x1, x2, x1 + 0.5 * x2 + 0.3 * rnd.nextGaussian() > 0)
    }
    val df = rows.toDF("x1", "x2", "y")
    def lossAt(iters: Int): Double = {
      val w = ClassifierOps.logisticTrain(df, Seq(col("x1"), col("x2")), col("y"), 1.0, iters)
      ClassifierOps.logLoss(
        df.withColumn("p", ClassifierOps.score(Seq(col("x1"), col("x2")), w)),
        col("p"), col("y"))
    }
    val l0 = lossAt(0)
    assert(math.abs(l0 - math.log(2)) < 1e-12) // zero weights score 0.5 everywhere
    val l3 = lossAt(3)
    val l15 = lossAt(15)
    assert(l3 < l0 && l15 < l3)
  }

  test("X7: a constant feature gets exactly zero weight and never poisons training") {
    val df = Seq((-2.0, 7.0, false), (-1.0, 7.0, false),
      (1.0, 7.0, true), (2.0, 7.0, true)).toDF("x", "c", "y")
    val w2 = ClassifierOps.logisticTrain(df, Seq(col("x"), col("c")), col("y"), 1.0, 50)
    val w1 = ClassifierOps.logisticTrain(df, Seq(col("x")), col("y"), 1.0, 50)
    assert(w2(1) === 0.0) // constant column: standardized to zero, zero gradient
    assert(math.abs(w2.head - w1.head) < 1e-9 && math.abs(w2(2) - w1(1)) < 1e-9)
  }

  test("X7: score() is the hand sigmoid of w·x + b over raw features") {
    val df = Seq(0.0, 1.0, -3.0).toDF("x")
    val got = df.select(ClassifierOps.score(Seq(col("x")), Seq(2.0, -1.0)))
      .as[Double].collect()
    val want = Seq(0.0, 1.0, -3.0).map(x => 1d / (1d + math.exp(-(2.0 * x - 1.0))))
    got.zip(want).foreach { case (g, e) => assert(math.abs(g - e) < 1e-15) }
  }

  test("X7: exact trainer (rational link) separates separable data and its weight " +
    "trajectory lands on 1e-6-grid doubles") {
    val df = Seq((-2.0, false), (-1.5, false), (-1.0, false),
      (1.0, true), (1.5, true), (2.0, true)).toDF("x", "y")
    val (w, m, sd) = ClassifierOps.logisticTrainExact(
      df, Seq(col("x")), col("y"), lr = 1.0, iters = 30)
    assert(w.head > 0) // +x predicts the positive class
    val right = df
      .withColumn("p", ClassifierOps.scoreStandardized(Seq(col("x")), w, m, sd))
      .filter((col("p") > 0.5) === col("y")).count()
    assert(right === 6L)
    // Every weight is a sum of 1e-6-rounded mean gradients (lr = 1), so it
    // must sit exactly on the decimal grid — the property that makes the
    // trajectory reproducible by ANY engine that rounds the same way.
    (w ++ m ++ sd).foreach { v =>
      val scaled = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(scaled.toDouble - v) < 1e-12, s"$v off the 1e-6 grid")
    }
  }

  test("X7: rational sigmoid matches the hand formula and brackets the exp sigmoid shape") {
    val df = Seq(-4.0, -1.0, 0.0, 1.0, 4.0).toDF("t")
    val got = df.select(ClassifierOps.rationalSigmoid(col("t"))).as[Double].collect()
    val want = Seq(-4.0, -1.0, 0.0, 1.0, 4.0).map { t =>
      val h = t / 2; 0.5 * (1 + h / (1 + math.abs(h)))
    }
    got.zip(want).foreach { case (g, e) => assert(g === e) } // bit-exact, not approx
    assert(got(2) === 0.5 && got(0) < 0.5 && got(4) > 0.5)
    assert(math.abs(got(0) - (1.0 - got(4))) < 1e-15) // odd symmetry around 0.5
  }

  test("X7: approx quantiles respect the sketch rank-error bound (q108's scale variant)") {
    val n = 10000
    val df = new scala.util.Random(7).shuffle((1 to n).toList).toDF("v")
    val Array(p50, p99) = df
      .agg(percentile_approx(col("v"), array(lit(0.5), lit(0.99)), lit(100)).as("ps"))
      .select(col("ps").getItem(0), col("ps").getItem(1))
      .as[(Int, Int)].collect().map(r => Array(r._1, r._2)).head
    // accuracy=100 => rank error <= n/100; values here ARE ranks.
    assert(math.abs(p50 - n / 2) <= n / 100 + 1)
    assert(math.abs(p99 - (n * 99) / 100) <= n / 100 + 1)
  }
}

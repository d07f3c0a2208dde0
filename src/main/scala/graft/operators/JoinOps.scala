package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks natively (builder prompt's custom-operator
  * examples: as-of join, range join), built by composition — preference (a)
  * from the prompt: no custom physical operator needed, and both shapes
  * avoid the naive per-key cross product.
  */
object JoinOps {

  /** AS-OF (backward) join: for every left row, the single latest right row
    * with the same key and `rightTime <= leftTime`; left rows with no
    * predecessor keep null payload (left-outer semantics, row count
    * preserved — DuckDB's `ASOF LEFT JOIN` is the oracle).
    *
    * NOT an inequality join (which degenerates to a per-key cross product):
    * both sides union into one stream, one window over
    * partitionBy(key).orderBy(time, side) carries the last non-null right
    * payload forward, and left rows read it — ONE shuffle on the key, linear
    * scan, no candidate blowup. Right rows order before left rows at equal
    * time, so `<=` is inclusive.
    *
    * Right rows must be unique per (key, time) — pre-aggregate duplicates
    * (e.g. max payload) or the carried row is order-dependent. */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofJoinBackward needs at least one payload column")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .select((Seq(col(key), col(rightTime).as("__t")) ++ payload.map(c => col(c).as(s"__p_$c"))): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the MATCHED right row as ONE struct: the struct is non-null for
    // every right row even when all its payload fields are null, so a
    // matched row with a NULL payload value is returned as-is (DuckDB ASOF
    // LEFT JOIN semantics) — per-column last(payload, ignoreNulls) would
    // skip it and wrongly resurrect an older non-null payload.
    val withRow = unioned.withColumn("__r",
      when(col("__side") === 0, struct(payload.map(c => col(s"__p_$c").as(c)): _*)))
    val carried = payload.foldLeft(
      withRow.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))) {
      (df, c) => df.withColumn(c + "_asof", col("__asof").getField(c))
    }
    carried.filter(col("__side") === 1)
      .drop((Seq("__t", "__side", "__r", "__asof") ++ payload.map("__p_" + _)): _*)
  }

  /** Bucket-bounded range join: pairs with equal `key` and
    * `rightTime ∈ [leftTime + lo, leftTime + hi]`.
    *
    * Naive `t BETWEEN` join conditions force a per-key nested loop; here
    * both sides bucket time by the window span and join on
    * (key, bucket) — each left row explodes to the ≤2-3 candidate buckets
    * its window overlaps — then the exact range filter runs on the bounded
    * candidates. Same bucket-bounded candidate-generation discipline as the
    * LSH/IVF operators: never key×key. */
  def rangeJoinByBucket(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"empty range [$lo, $hi]")
    val width = hi - lo
    val r = right.withColumn("__bucket", floor(col(rightTime) / width))
    val l = left.withColumn("__bucket",
      explode(sequence(floor((col(leftTime) + lo) / width), floor((col(leftTime) + hi) / width))))
    l.join(r, Seq(key, "__bucket"))
      .filter(col(rightTime) >= col(leftTime) + lo && col(rightTime) <= col(leftTime) + hi)
      .drop("__bucket")
  }

  /** Bloom-REDUCED inner equi-join: semi-join reduction for the join shape
    * where the dim side is too big to broadcast-hash-join (its ROWS don't
    * fit an executor's build table) but its KEY SET still compresses into a
    * few-MB Bloom sketch (~k/ln2 ≈ 7 bits per distinct key at fp ≈ 2^−k).
    * Both sides of a plain sort-merge join pay a full shuffle; here the
    * dim's distinct keys fold into a [[graft.functions.BloomBuild]] sketch
    * (fixed-size bitset buffer, OR-merge — partial aggregation ships
    * constant state), the sketch rides the probe scan as a codegen'd
    * literal predicate (`graft_bloom_contains` — no join, no shuffle), and
    * only bloom-POSITIVE fact rows enter the exact join's exchange. Blooms
    * have no false negatives, so the result is EXACTLY the inner join —
    * the filter only shrinks the shuffle to (true matches + ε false
    * positives), which at 100 TB is the difference between shuffling the
    * fact table and shuffling its matching sliver.
    *
    * This is the explicit, deterministically-SIZED form of Spark's own
    * runtime bloom-filter rewrite (`InjectRuntimeFilter`, which declines
    * when it cannot prove selectivity): sizing comes from the measured
    * distinct-key count ([[graft.functions.BloomUtil.sizeFor]], clamped
    * 2 KiB..16 MiB), not from a planner estimate, and the reduction is
    * guaranteed present in the plan rather than cost-model-dependent.
    *
    * Join semantics: INNER USING(`bigKey`) — the output carries big's
    * columns plus small's non-key columns; NULL keys never match in either
    * engine (the probe's null propagates to a null predicate, which
    * filters), matching inner-join semantics exactly. Key TYPES must match
    * exactly and are refused otherwise: the sketch compares canonical
    * STRING renderings, so a coercion the exact join would apply (INT 3 vs
    * DECIMAL 3.00 → "3" vs "3.00") renders differently and the prefilter
    * would silently drop TRUE matches — a false negative, the one failure
    * mode the operator's contract rules out. Cast one side explicitly
    * instead. `mBits = 0` auto-sizes from the distinct-key count; an
    * explicit positive `mBits` pins the sketch size (a mis-sized sketch
    * still returns exact results — it only loses prefilter selectivity). */
  def bloomReducedJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, mBits: Int = 0, k: Int = 5): DataFrame = {
    import graft.functions.GraftFunctions
    val bt = big.schema(bigKey).dataType
    val st = small.schema(smallKey).dataType
    require(bt == st,
      s"bloomReducedJoin key types must match exactly ($bigKey: $bt vs " +
        s"$smallKey: $st) — the sketch compares string renderings, and a " +
        "coercion the exact join would apply can render differently, " +
        "silently dropping true matches; cast one side explicitly")
    require(smallKey == bigKey || !small.columns.contains(bigKey),
      s"bloomReducedJoin: small side already carries a column named " +
        s"'$bigKey'; renaming its key '$smallKey' for the USING join would " +
        "collide — rename or drop the clashing column first")
    val idx = DedupOps.buildFingerprintBloom(
      small.filter(col(smallKey).isNotNull), col(smallKey), k, mBits)
    big.filter(GraftFunctions.bloomContains(
        col(bigKey).cast("string"), idx.sketch, idx.k))
      .join(small.withColumnRenamed(smallKey, bigKey), Seq(bigKey))
  }
}

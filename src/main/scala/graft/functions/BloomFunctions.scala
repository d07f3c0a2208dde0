package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed Bloom filter: the broadcast-sketch primitive behind
  * decontamination at 100 TB (`CurationOps.contamination` scaladoc). The
  * filter over the train-side vocabulary is built DISTRIBUTED by a typed
  * `Aggregator` (fixed-size bitset buffer, bitwise-OR merge — constant
  * state per partition regardless of corpus size), collected to the driver
  * as a sketch (same class of driver state as k-means centroids: KB-sized,
  * size-independent of the data), and probed by the codegen'd
  * [[BloomMightContain]] expression — so the eval-side scan never shuffles
  * and only bloom-positive rows reach the exact rescan join.
  *
  * Hashing is FNV-1a 64 over the raw UTF-8 bytes with Kirsch–Mitzenmacher
  * double hashing (position_i = h1 + i·h2 mod m): build side (JVM String)
  * and probe side (UTF8String) hash the same bytes, so membership is exact
  * across the two representations. No false negatives, by construction.
  */
object BloomUtil {

  /** Bit size for an expected vocabulary of `nKeys` with `k` hash probes:
    * m = n·k/ln2 sets the per-key bit budget so each of the k probes lands
    * on a half-set filter at design load → false-positive rate ≈ 2^−k
    * (~3% at k=5). Rounded up to a whole number of 64-bit words and clamped
    * to [2^14, 2^27] bits (2 KiB .. 16 MiB): below, hashing overhead
    * dominates; above, a plan-inlined literal is no longer the right
    * transport and the sketch should ride a broadcast variable instead.
    * Overload or saturation is graceful — the fp rate degrades smoothly
    * ((1−e^(−kn/m))^k) and the exact rescan keeps results correct at ANY
    * load; the sizing only controls how much probe volume the prefilter
    * absorbs. */
  def sizeFor(nKeys: Long, k: Int): Int = {
    require(nKeys >= 0 && k > 0, "nKeys must be >= 0 and k positive")
    val raw = math.ceil(nKeys.toDouble * k / math.log(2.0)).toLong
    val clamped = math.min(1L << 27, math.max(1L << 14, raw))
    (((clamped + 63) / 64) * 64).toInt
  }

  /** FNV-1a 64 over bytes; `seed` selects independent hash streams. */
  def fnv64(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Set the k KM-derived bit positions of `bytes` in `words` (in place). */
  def setBits(words: Array[Long], bytes: Array[Byte], k: Int): Unit = {
    val m = words.length.toLong * 64L
    val h1 = fnv64(bytes, 0L)
    val h2 = fnv64(bytes, 0x9e3779b97f4a7c15L) | 1L // odd → full-period stride
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      words((pos >>> 6).toInt) |= 1L << (pos & 63L)
      i += 1
    }
  }

  /** Static probe core shared by interpreted eval and generated code. */
  def mightContain(words: Array[Long], bytes: Array[Byte], k: Int): Boolean = {
    val m = words.length.toLong * 64L
    val h1 = fnv64(bytes, 0L)
    val h2 = fnv64(bytes, 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def toWords(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, "bloom byte length must be a multiple of 8")
    val words = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(words)
    words
  }
}

/** Typed Aggregator building a Bloom filter over a string column: buffer is
  * the fixed-size bitset (mBits/64 longs), merge is bitwise OR — partial
  * aggregation ships constant-size state per partition, and the result is
  * independent of row order and partitioning. */
class BloomBuild(mBits: Int, k: Int)
    extends Aggregator[String, Array[Long], Array[Byte]] {
  require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(b: Array[Long], s: String): Array[Long] = {
    if (s != null) BloomUtil.setBits(b, s.getBytes(java.nio.charset.StandardCharsets.UTF_8), k)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(w: Array[Long]): Array[Byte] = BloomUtil.toBytes(w)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}

/** Codegen'd Bloom membership probe: `str` against a FOLDABLE binary bloom
  * (the collected sketch inlined as a literal — reference-object'd into the
  * generated class, decoded to long[] once, not per row) with foldable k.
  * Null input string → null (TernaryExpression default). */
case class BloomMightContain(str: Expression, bloom: Expression, kExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = bloom
  override def third: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string to probe, got ${str.dataType.simpleString}")
    else if (bloom.dataType != BinaryType || !bloom.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a foldable binary bloom literal")
    else if (bloom.eval(null) == null)
      // A null sketch would otherwise NPE opaquely inside the lazy decode
      // during planning/codegen (e.g. graft_bloom_contains(s, NULL, k)).
      TypeCheckResult.TypeCheckFailure(s"$prettyName bloom sketch must be a non-null binary literal")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a foldable int k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  override def prettyName: String = GraftFunctions.BloomContainsName

  // Decoded once per task (transient: re-derived from the foldable children
  // after serialization), not once per row.
  @transient private lazy val words: Array[Long] =
    BloomUtil.toWords(bloom.eval(null).asInstanceOf[Array[Byte]])
  @transient private lazy val kVal: Int = kExpr.eval(null).asInstanceOf[Int]

  override protected def nullSafeEval(s: Any, b: Any, kk: Any): Any =
    BloomUtil.mightContain(words, s.asInstanceOf[UTF8String].getBytes, kVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, _, _) => {
      val w = ctx.addReferenceObj("bloomWords", words, "long[]")
      s"${ev.value} = graft.functions.BloomUtil.mightContain($w, $s.getBytes(), $kVal);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomMightContain =
    copy(str = newFirst, bloom = newSecond, kExpr = newThird)
}

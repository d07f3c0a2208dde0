package graft

import org.apache.spark.sql.functions._
import graft.functions.{BoundedLevenshtein, GraftFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** Parity of the native banded-DP kernel with Spark's built-in 3-arg
  * `levenshtein` — the contract that lets the verify operators swap the
  * built-in out without touching any oracle. */
class BoundedLevenshteinSpec extends SparkSpec {

  private def kernel(a: String, b: String, t: Int): Int =
    BoundedLevenshtein.distance(UTF8String.fromString(a), UTF8String.fromString(b), t)

  test("kernel matches the built-in on random Unicode pairs at every threshold") {
    val rnd = new scala.util.Random(42)
    // Multibyte-heavy alphabet: 2-, 3-, 4-byte UTF-8 sequences (é, 漢, 💯
    // — the last is a surrogate pair in Java, one edit unit in both
    // engines) plus ASCII and the space the corpus tokenizes on.
    val alphabet = "abc déé漢字💯ß "
    def randStr(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map { _ =>
        alphabet.charAt(rnd.nextInt(alphabet.length)) match {
          case c if Character.isHighSurrogate(c) => "💯"
          case c if Character.isLowSurrogate(c) => "💯"
          case c => c.toString
        }
      }.mkString
    val pairs = Seq.tabulate(300) { i =>
      // Mix of unrelated pairs and near-dup pairs (small random edits of a
      // shared base) so small thresholds see both -1 and exact hits.
      if (i % 2 == 0) (randStr(40), randStr(40))
      else {
        val base = randStr(40)
        val edited = base.map(c => if (rnd.nextInt(10) == 0) 'Z' else c) + randStr(3)
        (base, edited)
      }
    }
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    for (t <- Seq(0, 1, 2, 5, 50)) {
      val rows = df.select(
        levenshtein(col("a"), col("b"), t).as("builtin"),
        GraftFunctions.levenshteinBounded(col("a"), col("b"), t).as("native"),
        col("a"), col("b")).collect()
      rows.foreach { r =>
        assert(r.getInt(0) == r.getInt(1),
          s"t=$t a='${r.getString(2)}' b='${r.getString(3)}': " +
            s"builtin=${r.getInt(0)} native=${r.getInt(1)}")
      }
    }
  }

  test("edge cases: empty, equal, length-gap cutoff, null propagation") {
    assert(kernel("", "", 0) == 0)
    assert(kernel("", "abc", 3) == 3)
    assert(kernel("", "abc", 2) == -1)
    assert(kernel("same text", "same text", 0) == 0)
    // Shared prefix+suffix strips to a 1-char core.
    assert(kernel("abcXdef", "abcYdef", 5) == 1)
    // Length gap alone exceeds the threshold.
    assert(kernel("ab", "abcdefgh", 3) == -1)
    import spark.implicits._
    val r = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(GraftFunctions.levenshteinBounded(col("a"), col("b"), 3)).head
    assert(r.isNullAt(0))
  }
}

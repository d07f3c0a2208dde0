package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, NfcNormalize}
import org.apache.spark.unsafe.types.UTF8String

/** Contract of the native NFC normalization expression: byte-for-byte
  * agreement with `java.text.Normalizer` (the JDK's UAX #15 implementation,
  * the same algorithm DuckDB's `nfc_normalize` oracle runs), object-identity
  * fast path on already-normalized input, and standard null propagation. */
class NfcNormalizeSpec extends SparkSpec {

  private def kernel(s: String): String =
    NfcNormalize.normalize(UTF8String.fromString(s)).toString

  test("kernel matches java.text.Normalizer NFC on random Unicode strings") {
    val rnd = new scala.util.Random(7)
    // Composition-rich alphabet: combining acute/diaeresis/cedilla, their
    // precomposed partners, Hangul jamo (algorithmic composition), a
    // supplementary-plane char, ASCII, and space.
    val pieces = Seq("a", "e", "c", "\u0301", "\u0308", "\u0327", "\u00e1",
      "\u00eb", "\u00e7", "\u1100", "\u1161", "\u11a8", "\uac00", "\ud83d\udcaf", " ", "z")
    (1 to 500).foreach { _ =>
      val s = (0 until rnd.nextInt(30)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString
      val expected = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(kernel(s) == expected, s"input codepoints: ${s.codePoints().toArray.mkString(",")}")
    }
  }

  test("already-NFC input returns the same UTF8String object (no allocation)") {
    val in = UTF8String.fromString("plain ascii stays untouched")
    assert(NfcNormalize.normalize(in) eq in)
    val precomposed = UTF8String.fromString("café")
    assert(NfcNormalize.normalize(precomposed) eq precomposed)
  }

  test("composes decomposed sequences: a+COMBINING ACUTE -> U+00E1") {
    assert(kernel("a\u0301") == "\u00e1")
    assert(kernel("\u1100\u1161\u11a8") == "\uac01") // Hangul jamo -> syllable
  }

  test("DataFrame path (codegen) unifies byte-distinct canonical equivalents and propagates null") {
    import spark.implicits._
    val df = Seq(
      (1L, "a\u0301 b"), (2L, "\u00e1 b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
      .withColumn("norm", GraftFunctions.nfcNormalize(col("s")))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(2) == rows(1).getString(2))
    assert(rows(0).getString(2) == "\u00e1 b")
    assert(rows(2).isNullAt(2))
  }

  test("non-string input fails analysis, not execution") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("n")
    val e = intercept[Exception] {
      df.select(GraftFunctions.nfcNormalize(col("n"))).collect()
    }
    assert(e.getMessage.contains("string"))
  }
}

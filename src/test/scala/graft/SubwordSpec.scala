package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Greedy longest-match subword tokenization (the codegen'd SubwordEncode
  * trie): hand-checked merges, char fallback, word-boundary isolation, and
  * a property check against an independent brute-force reference matcher. */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String, vocab: Seq[String] = TextOps.defaultSubwordVocab): Seq[String] =
    Seq(Tuple1(text)).toDF("text")
      .select(TextOps.subwordTokenize(col("text"), vocab))
      .collect().head.getSeq[String](0)

  test("longest match wins and full words beat their prefixes") {
    assert(toks("table") === Seq("tab", "le"))
    assert(toks("value") === Seq("value")) // "val" is in vocab too; longest wins
    assert(toks("window merge") === Seq("win", "dow", "mer", "ge"))
    assert(toks("spark") === Seq("spark"))
  }

  test("char fallback keeps tokenization total") {
    assert(toks("customer") === Seq("c", "u", "s", "t", "om", "er"))
    assert(toks("xyz", Seq("ab")) === Seq("x", "y", "z"))
  }

  test("word boundaries: matches never cross spaces, empties vanish") {
    // "l e" would merge to vocab entry "le" if the matcher ignored spaces
    assert(toks("l e") === Seq("l", "e"))
    assert(toks("") === Seq.empty)
    assert(toks("  the   a  ") === Seq("the", "a"))
  }

  test("char fallback keeps supplementary-plane characters intact (no lone surrogates)") {
    // U+1F600 is two UTF-16 units; fallback must emit it as ONE token, and
    // the adjacent vocab matches must be unaffected
    val emoji = new String(Character.toChars(0x1F600))
    assert(toks(s"the$emoji", Seq("the")) === Seq("the", emoji))
    assert(toks(s"$emoji$emoji", Seq("zz")) === Seq(emoji, emoji))
  }

  test("null text propagates null; vocab entries with spaces are rejected") {
    val r = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(TextOps.subwordTokenize(col("text"))).collect().head
    assert(r.isNullAt(0))
    val ex = intercept[Exception] {
      Seq(Tuple1("x")).toDF("text")
        .select(TextOps.subwordTokenize(col("text"), Seq("a b"))).collect()
    }
    assert(ex.getMessage.contains("space") ||
      Option(ex.getCause).exists(_.getMessage.contains("space")))
  }

  /** Independent reference: per word, try every vocab entry at each
    * position, take the longest (no trie). */
  private def reference(text: String, vocab: Seq[String]): Seq[String] =
    text.split(" ", -1).filter(_.nonEmpty).toSeq.flatMap { w =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val matches = vocab.filter(v => w.startsWith(v, i))
        val step = if (matches.isEmpty) w.substring(i, i + 1)
          else matches.maxBy(_.length)
        out += step
        i += step.length
      }
      out.toSeq
    }

  test("trie agrees with the brute-force reference on random text") {
    val rng = new scala.util.Random(3)
    val alphabet = "abcdeft "
    val vocab = Seq("ab", "abc", "cde", "de", "f", "tt", "abcd")
    val texts = Seq.fill(200)(
      (0 until rng.nextInt(30)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val got = texts.map(Tuple1(_)).toDF("text")
      .select(TextOps.subwordTokenize(col("text"), vocab))
      .collect().map(_.getSeq[String](0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g === reference(t, vocab), s"text '$t'")
    }
  }

  test("subword counts feed packing: size(...) is the trained-token count") {
    val df = Seq((1L, "table value"), (2L, "customer")).toDF("doc_id", "text")
      .select(col("doc_id"), size(TextOps.subwordTokenize(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(df(1L) === 3) // tab le value
    assert(df(2L) === 6) // c u s t om er
  }
}

package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Contract of the mojibake (UTF-8-read-as-Latin-1) detector/repairer
  * (q156 exercises the per-source rollup; this spec pins the transform).
  * The damage oracle here is the JVM's own charset machinery — new String
  * (s.getBytes(UTF_8), ISO_8859_1) — i.e. the REAL failure being modeled,
  * not a hand-built replace table. */
class MojibakeSpec extends SparkSpec {
  import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
  import spark.implicits._

  private def damage(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)
  private def fix(s: String): String =
    Seq(s).toDF("t").select(TextOps.fixMojibake(col("t"))).head.getString(0)
  private def count(s: String): Long =
    Seq(s).toDF("t").select(TextOps.mojibakeCount(col("t"))).head.getLong(0)

  test("detector counts damaged sequences; clean accented text scores 0") {
    assert(count(damage("café résumé naïve")) === 4L) // é, é, é, ï
    assert(count("café résumé naïve") === 0L)
    assert(count("plain ascii only") === 0L)
  }

  test("repair inverts real UTF-8-as-Latin-1 damage exactly") {
    val originals = Seq("café", "über die brücke", "mañana señor",
      "àâäéèêëîïôöùûüÿçñ all of Latin-1's accents")
    originals.foreach { o =>
      assert(fix(damage(o)) === o, s"failed to invert damage of '$o'")
    }
  }

  test("clean text passes through byte-identical; repair is idempotent") {
    val clean = "café résumé"
    assert(fix(clean) === clean)
    val repaired = fix(damage(clean))
    assert(fix(repaired) === repaired)
  }

  test("mixed clean+damaged row is refused (left untouched), not guessed at") {
    // a stray 0xE9 byte beside a damaged pair is not valid UTF-8 after
    // re-encoding — the invertibility guard must reject the whole row
    val mixed = "café and " + damage("café")
    assert(count(mixed) === 1L) // damage IS visible to the detector
    assert(fix(mixed) === mixed) // but repair refuses
  }

  test("non-Latin-1 text (CJK) is never touched even alongside damage") {
    val cjk = "你好 " + damage("café")
    assert(fix(cjk) === cjk)
  }

  test("damage model sanity: the spec's damage() really is C3-pair mojibake") {
    assert(damage("é") === "Ã©")
  }
}

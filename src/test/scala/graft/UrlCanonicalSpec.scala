package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Edge-case contract of the URL canonicalization built-ins (q144 exercises
  * the four derived corpus shapes; this spec pins the transform itself). */
class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(TextOps.canonicalizeUrl(col("u"))).head.getString(0)
  private def host(url: String): String =
    Seq(url).toDF("u").select(TextOps.urlHost(col("u"))).head.getString(0)

  test("case, default port, fragment, trailing slash, tracking params all normalize away") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&utm_medium=y#sec")
      === "https://www.example.com/A/B")
    assert(canon("http://h.example.org:80/p") === "http://h.example.org/p")
  }

  test("path case and non-default ports are preserved") {
    assert(canon("https://h.example.com:8443/Path") === "https://h.example.com:8443/Path")
    assert(canon("http://h.example.com:8080/") === "http://h.example.com:8080")
  }

  test("query params: tracking dropped, empties dropped, rest sorted; all-dropped leaves no '?'") {
    assert(canon("https://h.example.com/p?z=1&a=2&fbclid=abc&gclid=x&&m=3")
      === "https://h.example.com/p?a=2&m=3&z=1")
    assert(canon("https://h.example.com/p?utm_campaign=c") === "https://h.example.com/p")
  }

  test("tracking-param match is anchored to the NAME: gclid2/fbclid_x are ordinary params") {
    // 'utm_*, fbclid, gclid' semantics — a param whose name merely STARTS
    // with fbclid/gclid (gclid2=x, fbclid_x=1) must survive; bare 'gclid'
    // with no '=' must still drop (round-10 ADVICE).
    assert(canon("https://h.example.com/p?gclid2=x&fbclid_x=1&gclid=y&fbclid")
      === "https://h.example.com/p?fbclid_x=1&gclid2=x")
  }

  test("idempotence: canonicalizing a canonical URL is a fixpoint") {
    val urls = Seq(
      "HTTPS://A.Example.COM:443/x/?utm_source=1&b=2&a=1#f",
      "http://plain.example.org/",
      "https://h.example.com/p?z=9&y=8")
    urls.foreach { u =>
      val once = canon(u)
      assert(canon(once) === once, s"not a fixpoint for $u")
    }
  }

  test("host extraction strips only the scheme's own default port; registeredDomain takes last two labels") {
    assert(host("https://Deep.Sub.Example.COM:443/x") === "deep.sub.example.com")
    assert(host("http://h.example.com:443/x") === "h.example.com:443") // not http's default
    val d = Seq("deep.sub.example.com").toDF("h")
      .select(TextOps.registeredDomain(col("h"))).head.getString(0)
    assert(d === "example.com")
    // a preserved non-default port must not fragment the domain key
    val dp = Seq("h.example.com:8080").toDF("h")
      .select(TextOps.registeredDomain(col("h"))).head.getString(0)
    assert(dp === "example.com")
    // single-label hosts have no registered domain
    val dl = Seq("localhost").toDF("h")
      .select(TextOps.registeredDomain(col("h"))).head.getString(0)
    assert(dl === "")
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** The construction-time injection path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must resolve EVERY native
  * function by name with no runtime registration — the contract a
  * driver-owned cluster config relies on. (Runtime registration through
  * `GraftFunctions.register` is covered by every other spec.) */
class GraftExtensionsSpec extends SparkSpec {

  test("all six native functions resolve via SparkSessionExtensions injection") {
    val base = spark // force the shared session (and its SparkContext) first
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      // withExtensions, not spark.sql.extensions: the conf form is a
      // STATIC conf read from the SparkContext at context creation, so it
      // cannot apply to a session built over this suite's existing
      // context — the programmatic hook exercises the same apply().
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base, "expected a fresh session for the extensions path")
      val r = s2.sql(
        """SELECT graft_vec_dot(array(1d, 2d), array(3d, 4d)) AS d,
          |  graft_poly_hash('abc') AS h,
          |  graft_subword_encode('ab', array('a', 'b')) AS sw,
          |  graft_levenshtein_bounded('abc', 'abd', 2) AS lev,
          |  graft_nfc_normalize('a\u0301') AS nfc,
          |  graft_bloom_contains('x', unhex(repeat('00', 16)), 5) AS bc
          |""".stripMargin).head
      assert(r.getDouble(0) === 11.0)
      assert(r.getLong(1) === ('a' * 31 + 'b') * 31 + 'c')
      assert(r.getSeq[String](2) === Seq("a", "b"))
      assert(r.getInt(3) === 1)
      assert(r.getString(4) === "\u00e1")
      assert(r.getBoolean(5) === false) // empty filter: nothing probes true
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}

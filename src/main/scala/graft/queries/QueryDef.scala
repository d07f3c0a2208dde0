package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator instantiation: a Spark query over the testdata
  * tables plus (when ANSI-expressible) the equivalent DuckDB SQL the driver
  * uses as a correctness oracle.
  *
  * Contract (builder prompt + Verify.scala): column NAMES and types must match
  * between `spark` and `oracle` — the driver sorts columns by name before
  * hashing values. Every query is deterministically ordered (full tie-break
  * keys) so row order can never differ between engines.
  */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def defs: Seq[QueryDef]
}

/** Deterministic pipeline prefixes several queries rebuild identically,
  * served once per session through [[graft.engine.Shared]]: the CC family
  * (q53/q101/q111 over the minhash pair graph; q61/q110 over the semantic
  * near-dup graph) otherwise re-runs the same candidate generation and
  * label propagation up to 6× per bench pass. Sharing elides only the
  * common prefix's recomputation — each query's RESULT (and oracle SQL)
  * is unchanged. Builds are pre-resolved OUTSIDE the nested `cached` call
  * (a by-name build that itself entered the shared map could recurse into
  * the backing ConcurrentHashMap mid-compute). */
object SharedPipelines {
  import graft.engine.{Shared, Tables}
  import graft.operators.{DedupOps, GraphOps, TextOps}
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.col

  /** The one sign-LSH plane set the semantic family (q61/q110/q112) keys
    * its buckets on — 2 tables' worth of 6 planes over dim 64. */
  val semPlanes: Seq[Seq[Double]] = graft.operators.SimilarityOps.lshPlanes(2, 64)

  /** q23's MinHash+LSH candidate-pair list over `documents` — the edge set
    * the lexical CC family clusters. */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    Shared.cached(s, s"minhash-pairs:$dir") {
      DedupOps.minhashLshCandidatesFromRows(
        TextOps.shingleRows(Tables.documents(s, dir),
          col("doc_id"), col("source"), col("text")),
        8, maxDf = 50)
    }

  /** Connected components over [[minhashPairs]] — q53's and q101's shared
    * (node, comp) labeling. */
  def minhashComps(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashPairs(s, dir)
    Shared.cached(s, s"minhash-cc:$dir") {
      GraphOps.connectedComponents(pairs, "a_id", "b_id")
    }
  }

  /** Connected components over the embedding-cosine near-dup pair graph
    * (cell × sign-LSH candidates, threshold 0.35) — q61's clusters and
    * q110's false-negative exclusion set. */
  def semanticComps(s: SparkSession, dir: String): DataFrame =
    Shared.cached(s, s"semantic-cc:$dir") {
      GraphOps.connectedComponents(
        DedupOps.embeddingNearDups(Tables.embeddings(s, dir), "vec_id",
          col("embedding"), col("label"), 0.35, semPlanes),
        "a_id", "b_id")
    }
}

/** Oracle-SQL fragments shared across query groups. */
object OracleSql {

  /** DuckDB expression equivalent to
    * [[graft.operators.SimilarityOps.signLshBucket]] over LITERAL
    * hyperplanes: bit j of the bucket is sign(v · p_j). The planes are
    * deterministic (fixed seed), so inlining their values keeps the bucket
    * function ANSI-expressible — which is what lets the LSH-bucketed queries
    * carry a hard hash oracle instead of a rows-only check. Both engines
    * accumulate the dot product left-to-right, so the sign agrees to the
    * last ulp. */
  def signLshBucketSql(vecExpr: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product($vecExpr, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** Recursive-CTE reproduction of [[graft.functions.SubwordEncode]]'s
    * greedy longest-match tokenization over the SAME literal vocabulary:
    * `jp` holds, per (doc, word, char position), the longest vocab entry
    * matching there (or 1 — the char fallback), and the recursive `walk`
    * follows those jumps, emitting one row per subword in `tok`. Append a
    * final SELECT over `walk`; the whole statement must start with this
    * fragment (it opens `WITH RECURSIVE`). */
  def subwordWalkSql(vocab: Seq[String]): String = {
    val values = vocab.map(v => s"('${v.replace("'", "''")}')").mkString(", ")
    // The vocab match is an INNER theta-join on a materialized position CTE
    // (`ps`), left-joined back on plain equality keys — DuckDB rejects a
    // correlated LEFT JOIN directly against the lateral unnest.
    s"""WITH RECURSIVE vocab(v) AS (VALUES $values),
       |wrd AS (SELECT doc_id, i.i AS wi, string_split(text, ' ')[i.i + 1] AS w
       |  FROM documents, unnest(range(len(string_split(text, ' ')))) AS i(i)),
       |ps AS (SELECT doc_id, wi, w, p.p AS pos FROM wrd, unnest(range(len(w))) AS p(p)),
       |mt AS (SELECT doc_id, wi, pos, max(len(v.v)) AS mlen
       |  FROM ps JOIN vocab v ON substr(ps.w, ps.pos + 1, len(v.v)) = v.v
       |  GROUP BY 1, 2, 3),
       |jp AS (SELECT ps.doc_id, ps.wi, ps.w, ps.pos, coalesce(mt.mlen, 1) AS jump
       |  FROM ps LEFT JOIN mt USING (doc_id, wi, pos)),
       |walk AS (
       |  SELECT jp.doc_id, jp.wi, jp.jump AS pos, substr(jp.w, 1, jp.jump) AS tok
       |  FROM jp WHERE jp.pos = 0
       |  UNION ALL
       |  SELECT j.doc_id, j.wi, wk.pos + j.jump, substr(j.w, wk.pos + 1, j.jump)
       |  FROM walk wk JOIN jp j ON j.doc_id = wk.doc_id AND j.wi = wk.wi AND j.pos = wk.pos)""".stripMargin
  }
}

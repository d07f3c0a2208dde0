package graft.queries

import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Data-integrity and SQL-surface queries: the operational glue around a
  * 100 TB engine — validating that a copy/rewrite preserved content, and
  * proving the same plans are reachable through the SQL entry point. */
object Integrity extends QueryGroup {

  /** Order-free content checksum — the migration-validation primitive:
    * after any repartition / rewrite / format migration (e.g. q44/q51's
    * round-trips at corpus scale), equal checksums prove content equality
    * without a sort or a join. Per-row md5 truncated to 60 bits (15 hex
    * digits keeps the BIGINT cast positive in every engine), folded with
    * bit_xor — commutative and associative, so the result is independent
    * of row order, partitioning, and parallelism, and the aggregate is one
    * map-side-combinable hash agg. Row encoding is INJECTIVE: each field
    * is length-prefixed (`<byte-length>:<value>`, NULL encodes as `N`) so
    * no field value can alias a marker or shift across a field boundary
    * — in-band sentinel separators (and concat_ws's null-skipping before
    * them) admit collisions for adversarial values (a field whose real
    * value IS the sentinel), which is exactly the class of corruption a
    * checksum exists to catch. The prefix code parses left-to-right (a
    * length never starts with `N`), so distinct field tuples always
    * produce distinct encoded strings. */
  private def checksumField(c: org.apache.spark.sql.Column) = {
    val s = c.cast("string")
    when(s.isNull, lit("N"))
      .otherwise(concat(octet_length(s).cast("string"), lit(":"), s))
  }
  private val q62 = QueryDef(
    "q62_content_checksum",
    (s, dir) => Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(conv(substring(md5(concat(
          checksumField(col("doc_id")),
          checksumField(col("lang")),
          checksumField(col("text")))), 1, 15), 16, 10).cast("long"))
          .as("checksum"))
      .orderBy(col("source")),
    Some("""SELECT source, count(*) AS n_rows,
           |  bit_xor(('0x' || substr(md5(
           |    CASE WHEN doc_id IS NULL THEN 'N' ELSE strlen(doc_id::VARCHAR)::VARCHAR || ':' || doc_id::VARCHAR END ||
           |    CASE WHEN lang IS NULL THEN 'N' ELSE strlen(lang)::VARCHAR || ':' || lang END ||
           |    CASE WHEN text IS NULL THEN 'N' ELSE strlen(text)::VARCHAR || ':' || text END), 1, 15))::BIGINT) AS checksum
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The SQL entry point: the fact⋈dim join + grouped agg shape authored as
    * SQL TEXT over registered temp views — `spark.sql` compiles it to the
    * same Catalyst plan the DataFrame API produces, proving a reference
    * user can bring their SQL unchanged. */
  private val q63 = QueryDef(
    "q63_sql_entrypoint",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("g_lineitem")
      Tables.orders(s, dir).createOrReplaceTempView("g_orders")
      s.sql("""SELECT o.o_orderpriority AS priority,
              |  count(*) AS n,
              |  round(avg(l.l_extendedprice), 2) AS avg_price
              |FROM g_lineitem l JOIN g_orders o ON l.l_orderkey = o.o_orderkey
              |GROUP BY o.o_orderpriority
              |ORDER BY o.o_orderpriority""".stripMargin)
    },
    Some("""SELECT o.o_orderpriority AS priority, count(*) AS n,
           |  round(avg(l.l_extendedprice), 2) AS avg_price
           |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin))

  override val defs: Seq[QueryDef] = Seq(q62, q63)
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Mergeable per-group TOP-K — the aggregate form of "top k rows per
  * group". The conventional plan (window `row_number() <= k`) SORTS every
  * group's full row set after shuffling every row to its group's
  * partition; this Aggregator's buffer is the k-bounded ordered list
  * itself, so partial aggregation runs map-side and only ≤ k rows PER
  * GROUP PER PARTITION ever cross the exchange — at 100 TB the difference
  * between shuffling the fact table and shuffling k·partitions rows.
  * Same mergeable-monoid discipline as [[MisraGries]] (bounded state,
  * order-insensitive merge) but EXACT: top-k under a total order is a
  * true monoid fold, no approximation budget.
  *
  * Order: value DESC, id ASC — the id tiebreak makes the result a
  * deterministic function of the data under any partitioning or arrival
  * order (a bare value order would keep an arbitrary id among ties).
  * The DESC comparison is `java.lang.Double.compare` reversed, NOT
  * negate-and-sort-ascending: SQL's DESC (Spark and DuckDB alike) ranks
  * NaN ABOVE +Infinity, and −NaN is still NaN, so the negation trick
  * would quietly evict NaN rows the window-rank plan keeps — a silent
  * divergence from the oracle on NaN data. NULL values must be filtered
  * by the caller (SQL top-k skips them; the tuple encoder cannot carry a
  * null primitive). */
class TopK(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "capacity k must be positive")

  private def ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // DESC; NaN sorts first
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    // Insert-if-competitive: skip the sort entirely for the common case of
    // a row below an already-full buffer's floor.
    if (b.size >= k && ord.gteq(x, b.last)) b
    else ((b :+ x).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

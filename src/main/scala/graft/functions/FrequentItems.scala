package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed Aggregator: at most `k`
  * (token, residual-count) entries of state per partial buffer, OR-free
  * mergeable (Agarwal et al., "Mergeable Summaries"), with the classic
  * guarantee: after summarizing n items, every item with true count
  * > n/(k+1) is PRESENT in the sketch, and each residual undercounts its
  * true count by at most n/(k+1).
  *
  * That makes the sketch a SUPERSET generator for heavy hitters — the same
  * prefilter + exact-rescan discipline as the Bloom decontamination path:
  * collect the ≤ k candidate tokens to the driver (bounded state, the
  * k-means-centroid class), then one exact count over candidates only
  * turns "approximately frequent" into the EXACT heavy-hitter set at any
  * corpus size. The full-vocabulary groupBy this replaces shuffles every
  * distinct token; the sketch ships k entries per partition and the rescan
  * aggregates only candidate rows.
  *
  * reduce: present → +1; room → insert at 1; full → decrement ALL by one
  * (dropping zeros) — the MG step. merge: sum counts, then if over
  * capacity subtract the (k+1)-th largest count from every entry and drop
  * the non-positive ones; both operations preserve the error bound and are
  * associative/commutative up to the guarantee, so the result is
  * partitioning-safe (the GUARANTEE is deterministic; residuals may vary,
  * which is why callers must rescan rather than report residuals).
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "capacity k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], s: String): Map[String, Long] = {
    if (s == null) b
    else b.get(s) match {
      case Some(c) => b.updated(s, c + 1L)
      case None if b.size < k => b.updated(s, 1L)
      case None =>
        // Decrement-all: drops one occurrence of k+1 DISTINCT items
        // (including the arriving one) — the total undercount budget grows
        // by at most 1 per n/(k+1) arrivals.
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // Subtract the (k+1)-th largest residual from everything: at most k
      // entries can stay positive, and the subtracted mass respects the
      // combined undercount budget of the two inputs.
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

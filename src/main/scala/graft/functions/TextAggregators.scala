package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** The deliberate custom-UDAF exercise from SURVEY §2.10 X4 / §7.4: a typed
  * `Aggregator[IN, BUF, OUT]` merging per-partition document-frequency maps.
  *
  * The vocabulary is FIXED at construction, so the buffer is a bounded map
  * (|vocab| entries max) regardless of corpus size — safe at 100 TB because
  * partial aggregation merges constant-size state. Unbounded-vocabulary
  * document frequency belongs to the explode + groupBy pipeline (q27 TF-IDF),
  * not an Aggregator; this class exists to exercise the typed-UDAF surface
  * where it IS the right shape (small controlled vocab, e.g. stopword or
  * marker-term statistics).
  */
class DocFrequency(vocab: Seq[String])
    extends Aggregator[Seq[String], Map[String, Long], Map[String, Long]] {

  private val vocabSet = vocab.toSet

  override def zero: Map[String, Long] = Map.empty

  /** One input row = one document's token list; membership counts once. */
  override def reduce(b: Map[String, Long], tokens: Seq[String]): Map[String, Long] =
    tokens.iterator.filter(vocabSet).toSet
      .foldLeft(b)((m, t) => m.updated(t, m.getOrElse(t, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (t, n)) => m.updated(t, m.getOrElse(t, 0L) + n) }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

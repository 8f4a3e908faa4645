package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Modal value with the reference's deterministic tie-break (count desc,
  * code asc) as a typed `Aggregator` — the single-shuffle alternative to
  * the two-aggregation plan in `ops.Rollup.modalCode` (SURVEY.md §2.11
  * called this the one justified custom-aggregate candidate).
  *
  * Trade-off, measured not assumed: the Map buffer partial-aggregates
  * map-side so only |codes| entries per partition cross the ONE shuffle,
  * but the buffer lives outside whole-stage codegen. It wins when the
  * extra shuffle of the two-step plan dominates (high row counts, few
  * buckets); the two-step plan wins when codes-per-key is huge. Both are
  * provided; both hash-match the same oracle. */
object ModalAgg extends Aggregator[String, Map[String, Long], ModalResult] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], code: String): Map[String, Long] =
    if (code == null) b else b.updated(code, b.getOrElse(code, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (c, n)) => acc.updated(c, acc.getOrElse(c, 0L) + n) }

  override def finish(m: Map[String, Long]): ModalResult =
    if (m.isEmpty) ModalResult(null, 0L)
    else {
      val (code, cnt) = m.minBy { case (c, n) => (-n, c) }
      ModalResult(code, cnt)
    }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[ModalResult] = Encoders.product[ModalResult]
}

case class ModalResult(modal_code: String, modal_count: Long)

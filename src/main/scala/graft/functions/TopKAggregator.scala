package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k aggregate: keeps the k best (ord DESC, id ASC) pairs per
 * group with O(k) state.
 *
 * Why a custom Aggregator (preference ladder (b) — typed aggregate): the
 * window-function form (`row_number over (partition by key order by ord)`)
 * sorts EVERY row of every group; this aggregate keeps k rows per group in
 * the hash-agg buffer, combines map-side, and shuffles only k rows per
 * group. At 100 TB, top-3-per-customer via window = full shuffle + sort of
 * the fact table; via this aggregate = a partial agg that ships 3 rows per
 * customer.
 *
 * Result order and ties are deterministic: (ord DESC, id ASC), exactly the
 * `w1_topn_per_group` window query's ordering — the two forms return
 * identical rows (proven in TopKAggregatorSpec).
 */
final case class ScoredId(ord: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.ord > b.ord || (a.ord == b.ord && a.id < b.id)

  /** Insert into a descending-sorted bounded list (O(k)). */
  private def insert(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
    val (front, back) = buf.span(better(_, x))
    val merged = front ::: x :: back
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[ScoredId] = Nil
  override def reduce(buf: List[ScoredId], in: ScoredId): List[ScoredId] =
    insert(buf, in)
  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SpaceSaving heavy-hitter sketch (Metwally et al., "Efficient computation
 * of frequent and top-k elements in data streams"): capacity-bounded
 * item→(count, err) summary. When a new item arrives at a full sketch it
 * evicts the current minimum and inherits its count as an overestimation
 * bound (`err`), so for every tracked item
 *
 *     true_count <= count   and   count - err <= true_count,
 *
 * with err bounded by n/capacity. This is the 100-TB complement to the
 * exact vocabulary head (`t9_vocab_topk`): the exact form shuffles one row
 * per DISTINCT item (fine for a 31-token synthetic vocab, painful for a
 * billion-key URL or n-gram domain); the sketch ships one
 * `capacity`-bounded buffer per partition regardless of domain size.
 *
 * Determinism contract: with capacity >= distinct-items the sketch never
 * evicts — counts are exact, err = 0, and the result is partition- and
 * order-independent (this is the regime the DuckDB oracle gate runs in,
 * same posture as the g6 HLL sketch's g6b companion gate). Under evictions
 * the summary is order-sensitive like any streaming sketch; the error
 * BOUNDS still hold (pinned in spec), ties evict the lexicographically
 * smallest key so single-stream replays are stable.
 *
 * Buffer: a plain HashMap with O(capacity) min-scan on eviction — adequate
 * for the 10^2..10^4 capacities heavy-hitter jobs use (the linked
 * "stream-summary" structure of the paper makes eviction O(1) if capacity
 * ever grows past that). Serialization is a flat length-prefixed buffer
 * that only runs at shuffle boundaries.
 */
final class SpaceSavingBuffer(val capacity: Int) {
  /** item -> [count, err] */
  val items = new java.util.HashMap[String, Array[Long]]()

  def add(item: String, inc: Long, err: Long): Unit = {
    val cur = items.get(item)
    if (cur != null) { cur(0) += inc; cur(1) += err }
    else if (items.size < capacity) items.put(item, Array(inc, err))
    else {
      var minKey: String = null
      var minCount = Long.MaxValue
      val it = items.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c < minCount || (c == minCount && (minKey == null || e.getKey < minKey))) {
          minCount = c; minKey = e.getKey
        }
      }
      items.remove(minKey)
      items.put(item, Array(minCount + inc, minCount + err))
    }
  }
}

/** `graft_heavy_hitters(item, capacity, k)`: SpaceSaving sketch aggregate
 * returning the top `k` of `capacity` tracked items as
 * array<struct<item, n, err>> ordered (n DESC, item ASC). */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(capacity > 0 && k > 0 && k <= capacity,
    "need 0 < k <= capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    val it = other.items.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey, e.getValue()(0), e.getValue()(1))
    }
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val entries = new Array[(String, Long, Long)](buf.items.size)
    var i = 0
    val it = buf.items.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1)); i += 1
    }
    val top = entries.sortBy { case (item, n, _) => (-n, item) }.take(k)
    new GenericArrayData(top.map { case (item, n, err) =>
      InternalRow(UTF8String.fromString(item), n, err)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.items.size)
    val it = buf.items.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len); in.readFully(kb)
      buf.items.put(new String(kb, "UTF-8"),
        Array(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0))
}

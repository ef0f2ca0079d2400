package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded top-k aggregate over packed BIGINT sort keys: keeps the k
  * LARGEST input values in a fixed-size binary min-heap and returns them
  * sorted descending.
  *
  * This is the scale-correct shape for per-group top-k. The standard
  * formulations both materialize O(group size) state somewhere:
  *   - `ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) <= k` sorts
  *     EVERY row of every group behind one hash exchange;
  *   - `slice(array_sort(collect_list(v)), 1, k)` collects whole groups
  *     into driver-sized arrays before truncating.
  * A TypedImperativeAggregate instead holds exactly k longs per group per
  * task, combines map-side (partial heaps merge by re-insertion), and
  * ships k×8 bytes per group through the exchange — the same partial/final
  * dataflow as `max`, generalized to k. 10^9-row groups cost the same
  * buffer as 10^3-row groups.
  *
  * The caller packs (sort value, tiebreak id) into one BIGINT — e.g.
  * `cents * 10^9 + id` — so ordering is total and deterministic and the
  * oracle can replay it with integer arithmetic. Null inputs are skipped
  * (SQL aggregate semantics); fewer than k inputs return a shorter array.
  */
case class TopKPacked(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {

  require(k > 0, s"topk_packed: k must be positive, got $k")

  override def prettyName: String = "topk_packed"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_packed requires a BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buffer.insert(other.values(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc)

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPacked =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPacked =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKPacked =
    copy(child = newChild)
}

/** Fixed-capacity binary min-heap of longs: root is the SMALLEST kept
  * value, so a new candidate either displaces the root (if larger) or is
  * discarded in O(1). All storage is one pre-sized primitive array —
  * no boxing, no growth, safe to hold per group per task.
  */
final class TopKHeap(val k: Int) {
  val values = new Array[Long](k)
  var size = 0

  def insert(v: Long): Unit =
    if (size < k) {
      values(size) = v
      size += 1
      var i = size - 1 // sift up
      while (i > 0 && values((i - 1) / 2) > values(i)) {
        val p = (i - 1) / 2
        val t = values(p); values(p) = values(i); values(i) = t
        i = p
      }
    } else if (v > values(0)) {
      values(0) = v
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && values(l) < values(m)) m = l
        if (r < size && values(r) < values(m)) m = r
        if (m == i) done = true
        else {
          val t = values(m); values(m) = values(i); values(i) = t
          i = m
        }
      }
    }

  def sortedDesc: Array[Long] = {
    val out = java.util.Arrays.copyOf(values, size)
    java.util.Arrays.sort(out)
    var i = 0; var j = out.length - 1 // reverse in place
    while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
    out
  }
}

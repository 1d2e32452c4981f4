package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values sketch aggregate: keeps the `k` smallest
  * DISTINCT values of `hash` seen in the group, each carrying the
  * payload with the minimum natural order among rows sharing that hash
  * (a deterministic tie-break, so the result is
  * input-order-independent). `eval` returns the payloads in ascending
  * hash order as `array<payload>`.
  *
  * This one aggregate is the engine's portable sketch primitive:
  *
  *  - KMV distinct-count estimate: `graft_kmin_by(h, h, k)` — the k-th
  *    smallest distinct hash `h_k` of a 60-bit uniform hash estimates
  *    `n_distinct ≈ (k-1) · 2^60 / h_k` (Bar-Yossef et al., "Counting
  *    distinct elements in a data stream", RANDOM 2002).
  *  - Deterministic uniform row sample: `graft_kmin_by(hash(row_key),
  *    value, k)` — min-hash sampling; any order statistic of the sample
  *    (median, quantiles) approximates the population's.
  *
  * Scale shape (100 TB): state is O(k) per group regardless of input
  * size, updates are map-side (partial aggregation ≡ the MapReduce
  * combiner), merges are union-then-trim — the shuffle carries ≤ k
  * (long, payload) pairs per group, never the rows. Unlike
  * `approx_count_distinct`/`percentile_approx` the result is a pure
  * function of the input SET with md5-derived hashing, so the DuckDB
  * oracle reproduces it bit-for-bit (`ORDER BY h ROW_NUMBER ≤ k`).
  *
  * Reference analog: `/root/reference/shared/samples/weather_stats.py`
  * computes per-key exact stats; this is the sketch companion a corpus
  * too large for exact distinct counting needs.
  */
case class KMinByHash(
    hash: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, Any]]
  with BinaryLike[Expression] {

  override def left: Expression = hash
  override def right: Expression = payload

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k < 1 || k > (1 << 20))
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmin_by: k must be in [1, ${1 << 20}], got $k")
    else if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmin_by: <hash> must be BIGINT, got ${hash.dataType.sql}")
    else payload.dataType match {
      case LongType | DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmin_by: <payload> must be BIGINT or DOUBLE, got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmin_by"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, Any] =
    new java.util.TreeMap[java.lang.Long, Any]()

  private def payloadMin(a: Any, b: Any): Any = payload.dataType match {
    case LongType =>
      if (a.asInstanceOf[Long] <= b.asInstanceOf[Long]) a else b
    case DoubleType =>
      if (java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double]) <= 0) a else b
  }

  private def insert(buf: java.util.TreeMap[java.lang.Long, Any], h: Long, p: Any): Unit = {
    // values are never null (update/merge filter nulls), so a null get
    // means "absent" — no containsKey double-lookup needed
    val existing = buf.get(h)
    if (existing != null) {
      buf.put(h, payloadMin(existing, p))
    } else if (buf.size < k) {
      buf.put(h, p)
    } else if (h < buf.lastKey()) {
      buf.put(h, p)
      buf.pollLastEntry()
    }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, Any],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, Any] = {
    val h = hash.eval(input)
    val p = payload.eval(input)
    if (h != null && p != null) insert(buf, h.asInstanceOf[Long], p)
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, Any],
                     other: java.util.TreeMap[java.lang.Long, Any]): java.util.TreeMap[java.lang.Long, Any] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, Any]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.values().iterator() // TreeMap iterates in ascending key order
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, Any]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    val isLong = payload.dataType == LongType
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      if (isLong) bb.putLong(e.getValue.asInstanceOf[Long])
      else bb.putDouble(e.getValue.asInstanceOf[Double])
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeMap[java.lang.Long, Any]()
    val isLong = payload.dataType == LongType
    var i = 0
    while (i < n) {
      val h = bb.getLong
      val p: Any = if (isLong) bb.getLong else bb.getDouble
      buf.put(h, p)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KMinByHash =
    copy(hash = newLeft, payload = newRight)
}

package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, CreateStruct, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator example: exact top-k rows per key.
  *
  * The built-in formulation (`row_number()` window + filter) sorts every
  * partition's full data and shuffles ALL rows. This operator reduces
  * each input partition to ≤ k rows per key BEFORE the shuffle (the
  * map-side combine), so shuffle volume is O(keys × k), not O(rows).
  * At 100 TB that's the difference between shuffling the dataset and
  * shuffling the answer.
  *
  * Memory safety at scale:
  *   - The partial stage's per-key heap map is bounded: when it reaches
  *     `graft.topk.flushKeys` keys (default 262144) it emits its
  *     contents and resets — early emission only means a few extra
  *     candidate rows through the shuffle, never a wrong answer, so
  *     high-cardinality keys can't OOM an executor.
  *   - The final stage requires a per-partition sort on (keys, order)
  *     and streams the first k rows of each key group. The sort is a
  *     SortExec, which spills through Spark's memory manager — the
  *     stage itself holds O(1) rows.
  *
  * Ordering must be total per key (pass a unique tiebreak column) for a
  * deterministic result; `descending` flips the whole (lexicographic)
  * order.
  */
case class TopKPerKey(keys: Seq[Expression], order: Expression, k: Int,
                      descending: Boolean, child: LogicalPlan) extends UnaryNode {
  require(k > 0)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Expression, k: Int,
                          descending: Boolean, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)) :+
      SortOrder(order, if (descending) Descending else Ascending))

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) executePartial() else executeFinal()

  /** Map-side reduction: a per-key bounded heap, flushed whenever the
    * key map reaches the threshold so memory stays bounded regardless
    * of key cardinality.
    */
  private def executePartial(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val ordExpr = order
    val kk = k
    val desc = descending
    val flushKeys = conf.getConfString("graft.topk.flushKeys", "262144").toInt
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val bound = BindReferences.bindReference(ordExpr, childOutput)
      val natural = TypeUtils.getInterpretedOrdering(bound.dataType)
        .asInstanceOf[Ordering[Any]]
      // Heap head must be the WORST kept row so it can be evicted:
      // keeping largest → worst is the minimum → reverse ordering.
      val heapOrd = if (desc) natural.reverse else natural
      val better: (Any, Any) => Boolean =
        if (desc) (a, b) => natural.gt(a, b) else (a, b) => natural.lt(a, b)
      // Buffer-backed order values (strings / binaries / nested rows)
      // alias the scan's reused row buffer, so a STORED value must come
      // from an eval against the copied row. Primitive values are safe
      // to store from the pre-copy eval — one eval per row, period.
      val bufferBacked = bound.dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.BinaryType => true
        case _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType => true
        case _ => false
      }
      var heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Any, InternalRow)]]
      // Fill path (heap not yet full): single eval, on the copy.
      def keepFresh(heap: mutable.PriorityQueue[(Any, InternalRow)], row: InternalRow): Unit = {
        val copied = row.copy()
        heap.enqueue((bound.eval(copied), copied))
      }
      // Replacement path: the compare already evaluated `ov` against the
      // transient row — reuse it unless it aliases the row buffer.
      def keepWith(heap: mutable.PriorityQueue[(Any, InternalRow)], row: InternalRow, ov: Any): Unit = {
        val copied = row.copy()
        heap.enqueue((if (bufferBacked) bound.eval(copied) else ov, copied))
      }
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def drain(): Unit = {
          val old = heaps
          heaps = mutable.LinkedHashMap.empty
          out = old.valuesIterator.flatMap(_.iterator.map(_._2))
        }
        override def hasNext: Boolean = {
          while (!out.hasNext && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(heap) =>
                if (heap.size < kk) keepFresh(heap, row)
                else {
                  val ov = bound.eval(row) // transient: compare (+ maybe store)
                  if (better(ov, heap.head._1)) { heap.dequeue(); keepWith(heap, row, ov) }
                }
              case None =>
                val heap = mutable.PriorityQueue.empty[(Any, InternalRow)](
                  Ordering.by[(Any, InternalRow), Any](_._1)(heapOrd))
                keepFresh(heap, row)
                heaps.put(key.copy(), heap)
            }
            if (heaps.size >= flushKeys) drain()
          }
          if (!out.hasNext && heaps.nonEmpty) drain()
          out.hasNext
        }
        override def next(): InternalRow = out.next()
      }
    }
  }

  /** Reduce side: input arrives clustered by key and sorted on
    * (keys, order), so emitting the first k rows of each key group is a
    * pure stream — no operator-held state beyond one key.
    */
  private def executeFinal(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var current: UnsafeRow = null
      var emitted = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (current == null || key != current) {
          current = key.copy()
          emitted = 0
        }
        emitted += 1
        emitted <= kk
      }
    }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ord, k, desc, child) =>
      TopKPerKeyExec(keys, ord, k, desc, partial = false,
        TopKPerKeyExec(keys, ord, k, desc, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API: `TopK.perKey(df, Seq("user_id"), Seq("value", "id"), 3)`. */
object TopK {
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
             k: Int, descending: Boolean = true): DataFrame = {
    import org.apache.spark.sql.classic.GraftPlanFactory
    val spark = df.sparkSession
    GraftPlanFactory.addStrategy(spark, TopKStrategy)
    val analyzed = GraftPlanFactory.analyzed(df)
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name)}"))
    val ordExpr: Expression = orderCols match {
      case Seq(one) => attr(one)
      case many     => CreateStruct(many.map(attr))
    }
    GraftPlanFactory.ofRows(spark, TopKPerKey(keyCols.map(attr), ordExpr, k, descending, analyzed))
  }
}

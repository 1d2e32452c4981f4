package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, CreateStruct, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator example: exact top-k rows per key.
  *
  * The built-in formulation (`row_number()` window + filter) sorts every
  * partition's full data and shuffles ALL rows. This operator keeps a
  * bounded heap per key: the partial stage reduces each input partition
  * to ≤ k rows per key before the shuffle (the map-side combine), the
  * final stage merges per key after a `ClusteredDistribution` exchange —
  * shuffle volume is O(keys × k), not O(rows). At 100 TB that's the
  * difference between shuffling the dataset and shuffling the answer.
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

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val ordExpr = order
    val kk = k
    val desc = descending
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
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Any, InternalRow)]]
      iter.foreach { row =>
        val key = keyProj(row)
        val ov = bound.eval(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue((ov, row.copy()))
            else if (better(ov, heap.head._1)) { heap.dequeue(); heap.enqueue((ov, row.copy())) }
          case None =>
            val heap = mutable.PriorityQueue.empty[(Any, InternalRow)](
              Ordering.by[(Any, InternalRow), Any](_._1)(heapOrd))
            heap.enqueue((ov, row.copy()))
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
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

package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe whose filter bytes ride a BROADCAST
  * VARIABLE, not a plan literal.
  *
  * Spark's own `BloomFilterMightContain` takes the serialized filter as
  * a child expression — fine for the optimizer-injected runtime
  * filters it was built for (they stay inside one exchange), but fatal
  * for a user-level operator: a `Literal(bytes)` is serialized into
  * every task binary of every stage that references it, duplicated
  * into codegen/explain strings, and round-tripped through the driver
  * on every plan copy. At decontamination scale (10⁸–10⁹ benchmark
  * grams → 120 MB–1.2 GB of filter) that inflates the PLAN itself to
  * the size of a small table. Here the expression tree holds only the
  * broadcast handle (a few bytes); executors fetch the filter once via
  * torrent broadcast and every task on the executor shares the one
  * deserialized copy — O(1) plan size at any filter size.
  *
  * `child` is the probed long itself — the filter must have been
  * built with `BloomFilter.putLong` on the same values
  * (`mightContainLong` applies the sketch library's own internal
  * hashing; no external hash wrapper is involved).
  */
case class BloomMightContainBroadcast(filter: Broadcast[BloomFilter],
                                      child: Expression)
    extends UnaryExpression with Predicate {
  override def prettyName: String = "graft_bloom_might_contain"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName probes longs; got ${child.dataType.catalogString}")
  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(v: Any): Any =
    filter.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastCls = classOf[Broadcast[_]].getName
    val filterCls = classOf[BloomFilter].getName
    val bfRef = ctx.addReferenceObj("graftBloomBcast", filter, bcastCls)
    // resolve the broadcast ONCE per generated-class instance (per
    // task), not per row — .value() is a map lookup + read lock
    val bfTerm = ctx.addMutableState(filterCls, "graftBloomFilter",
      v => s"$v = ($filterCls) $bfRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bfTerm.mightContainLong($c);")
  }
}

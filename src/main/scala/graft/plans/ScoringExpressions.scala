package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear-model scoring against a BROADCAST term table: per row, sum
  * the model terms of every token in the array — the per-document
  * inference step of the Naive-Bayes / linear bag-of-words
  * classifiers, as one codegen'd kernel call.
  *
  * Same plan-size discipline as [[BloomMightContainBroadcast]]: the
  * expression tree holds only the broadcast handle, never the model
  * (a capped classifier vocabulary is 10⁴–10⁶ entries — as a map
  * LITERAL it would be copied into every task binary and codegen
  * string). Executors fetch the map once via torrent broadcast; the
  * generated code resolves `.value()` once per task, then does one
  * hash lookup per token.
  *
  * Terms are fixed-point LONGS (the model's DECIMAL(18,6) terms ×10⁶)
  * so the per-row sum is exact integer arithmetic — order-independent
  * and overflow-safe for any real document (2⁶³ ∕ 10⁶ ≈ 9.2e12 worth
  * of summed log-ratio). Tokens absent from the map contribute
  * `missing` — 0 for the pruned-classifier contract (out-of-cap
  * features are neutral), an OOV surprisal penalty for LM scoring
  * (out-of-model n-grams are maximally surprising). Returns the
  * micro-scaled sum; callers divide by 10⁶ into a double.
  */
case class NbScoreBroadcast(model: Broadcast[java.util.HashMap[UTF8String, java.lang.Long]],
                            child: Expression, missing: Long = 0L)
    extends UnaryExpression {
  override def prettyName: String = "graft_nb_score"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName scores array<string> token lists; got ${other.catalogString}")
    }
  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = model.value
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = m.get(arr.getUTF8String(i))
        acc += (if (t != null) t.longValue() else missing)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastCls = classOf[Broadcast[_]].getName
    val mapCls = "java.util.HashMap"
    val mRef = ctx.addReferenceObj("graftNbBcast", model, bcastCls)
    // resolve the broadcast ONCE per generated-class instance (per
    // task), not per row
    val mTerm = ctx.addMutableState(mapCls, "graftNbModel",
      v => s"$v = ($mapCls) $mRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      s"""
         |long ${ev.value}Acc = 0L;
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    Object $t = $mTerm.get($c.getUTF8String($i));
         |    ${ev.value}Acc += ($t != null)
         |      ? ((java.lang.Long) $t).longValue() : ${missing}L;
         |  }
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native PQ kernels as Catalyst expressions — see
  * graft.functions.GraftPq for the bit-compatibility contract and why
  * the expression-composed forms (>64 KB of generated Java, janino
  * rejection, interpreted fallback) need them. The codebook rides the
  * expression as a reference object — one array per codegen stage, not
  * 16×32 literal subtrees.
  */
case class PqEncodeExpr(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_err", DecimalType(28, 6), nullable = false)))
  override def prettyName: String = "graft_pq_encode"

  // ‖c‖² per codebook entry — the same Scala fold the expression form
  // embeds as a literal (plan-time on the driver, recomputed lazily on
  // each executor after deserialization)
  @transient private lazy val cc: Array[Array[Double]] =
    cb.map(_.map(c => c.foldLeft(0.0)((acc, x) => acc + x * x)))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftPq.encode(input.asInstanceOf[ArrayData], cb, cc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
    val ccRef = ctx.addReferenceObj("pqCc", cc, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftPq.encode($c, $cbRef, $ccRef);")
  }
}

/** ADC distance of a code row against a query's (m, code, d2)
  * distance-table array: Σ_m dt[m·ksub + codes[m]].d2 as
  * decimal(28,6) — the per-pair kernel of the scan-shaped PQ search
  * (see GraftPq.adcSum for the exactness argument).
  */
case class AdcSumExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DecimalType(28, 6)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_adc_sum"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftPq.adcSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, d) =>
      s"${ev.value} = graft.functions.GraftPq.adcSum($c, $d);")
}

/** Per-query ADC distance table: array<struct<m int, code int,
  * d2 decimal(18,6)>> — exploded and broadcast as the join dimension
  * of the PQ search.
  */
case class PqDistTableExpr(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("m", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("d2", DecimalType(18, 6), nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pq_dist_table"

  @transient private lazy val cc: Array[Array[Double]] =
    cb.map(_.map(c => c.foldLeft(0.0)((acc, x) => acc + x * x)))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftPq.distTable(input.asInstanceOf[ArrayData], cb, cc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
    val ccRef = ctx.addReferenceObj("pqCc", cc, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftPq.distTable($c, $cbRef, $ccRef);")
  }
}

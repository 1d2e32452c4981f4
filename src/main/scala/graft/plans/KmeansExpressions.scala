package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native k-means assignment expressions — see
  * graft.functions.GraftKmeans for the bit-compatibility contract.
  * The codebook (and its ‖c‖² table) rides each expression as a
  * reference object, so Lloyd iterations with fresh centroid VALUES
  * reuse one compiled class instead of recompiling a k×dims literal
  * tree per iteration (the round-15 profiling finding on the trained
  * IVF/PQ family). All three are nullable = false like the composed
  * `least()` struct fold they replace (a null vector ties every score
  * and falls to index 0 there — the kernels replicate that).
  */
case class KmeansArgminExpr(child: Expression, cb: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmeans_argmin"

  @transient private lazy val cc: Array[Double] =
    cb.map(_.foldLeft(0.0)((acc, x) => acc + x * x))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def eval(input: InternalRow): Any =
    graft.functions.GraftKmeans.argmin(
      child.eval(input).asInstanceOf[ArrayData], cb, cc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("kmCb", cb, "double[][]")
    val ccRef = ctx.addReferenceObj("kmCc", cc, "double[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = graft.functions.GraftKmeans.argmin(
          ${c.isNull} ? null : ${c.value}, $cbRef, $ccRef);
        """,
      isNull = FalseLiteral)
  }
}

case class KmeansProbeCellsExpr(child: Expression, cb: Array[Array[Double]],
                                nProbes: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmeans_probe_cells"

  @transient private lazy val cc: Array[Double] =
    cb.map(_.foldLeft(0.0)((acc, x) => acc + x * x))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def eval(input: InternalRow): Any =
    graft.functions.GraftKmeans.probeCells(
      child.eval(input).asInstanceOf[ArrayData], cb, cc, nProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("kmCb", cb, "double[][]")
    val ccRef = ctx.addReferenceObj("kmCc", cc, "double[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.GraftKmeans.probeCells(
            ${c.isNull} ? null : ${c.value}, $cbRef, $ccRef, $nProbes);
        """,
      isNull = FalseLiteral)
  }
}

/** (cluster, cosine-to-own-centroid) — the prototypeScores kernel. */
case class KmeansArgminCosExpr(child: Expression, cb: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("c", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmeans_argmin_cos"

  @transient private lazy val cc: Array[Double] =
    cb.map(_.foldLeft(0.0)((acc, x) => acc + x * x))
  @transient private lazy val sqrtCc: Array[Double] =
    cc.map(java.lang.Math.sqrt)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def eval(input: InternalRow): Any =
    graft.functions.GraftKmeans.argminCos(
      child.eval(input).asInstanceOf[ArrayData], cb, cc, sqrtCc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("kmCb", cb, "double[][]")
    val ccRef = ctx.addReferenceObj("kmCc", cc, "double[]")
    val scRef = ctx.addReferenceObj("kmSqrtCc", sqrtCc, "double[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = graft.functions.GraftKmeans.argminCos(
          ${c.isNull} ? null : ${c.value}, $cbRef, $ccRef, $scRef);
        """,
      isNull = FalseLiteral)
  }
}

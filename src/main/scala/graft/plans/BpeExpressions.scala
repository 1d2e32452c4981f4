package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encode against a BROADCAST merge-rank table: for each token in
  * the array, split to character symbols + `</w>`, then repeatedly
  * merge the adjacent pair with the LOWEST learned rank (leftmost on
  * ties) until no pair is in the table — the standard BPE tokenizer
  * inference (Sennrich et al. 2016), one kernel call per row.
  *
  * Same plan-size discipline as [[NbScoreBroadcast]]: the expression
  * holds only the broadcast handle; a production merge table
  * (32k–100k merges) never rides the plan. Rank keys are
  * "left right" (space-joined — symbols never contain spaces: the
  * tokenizer splits on whitespace).
  *
  * The loop body lives in a plain static helper invoked from the
  * generated code, so the expression stays inside whole-stage codegen
  * without inlining an unreadable janino blob.
  */
case class BpeEncodeBroadcast(ranks: Broadcast[java.util.HashMap[String, Integer]],
                              child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName encodes array<string> token lists; got ${other.catalogString}")
    }
  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(v: Any): Any =
    BpeEncodeBroadcast.encodeAll(v.asInstanceOf[ArrayData], ranks.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastCls = classOf[Broadcast[_]].getName
    val mapCls = "java.util.HashMap"
    val rRef = ctx.addReferenceObj("graftBpeBcast", ranks, bcastCls)
    val rTerm = ctx.addMutableState(mapCls, "graftBpeRanks",
      v => s"$v = ($mapCls) $rRef.value();")
    // companion-object method via its static forwarder (the
    // GraftText-kernel calling convention)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BpeEncodeBroadcast.encodeAll($c, $rTerm);")
  }
}

object BpeEncodeBroadcast {
  /** The word-end marker — must match [[graft.operators.Bpe.EndMark]]. */
  val EndMark = "</w>"

  /** Encode every token of `arr`, concatenating subwords in order. */
  def encodeAll(arr: ArrayData,
                ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) encodeWord(arr.getUTF8String(i).toString, ranks, out)
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(word: String,
                         ranks: java.util.HashMap[String, Integer],
                         out: scala.collection.mutable.ArrayBuffer[UTF8String])
      : Unit = {
    // code-point symbols + end marker
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      syms += word.substring(i, i + w)
      i += w
    }
    syms += EndMark
    // repeatedly merge the lowest-rank (leftmost-on-tie) adjacent pair
    var done = syms.length < 2
    while (!done) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestIdx = j
        }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        syms.remove(bestIdx + 1)
        if (syms.length < 2) done = true
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level text kernels called from the generated code of the native
  * tokenize/shingle expressions (graft.plans.TokensExpr/ShinglesExpr).
  *
  * Semantics are EXACTLY the reference tokenization (cooler-MapReduce
  * `shared/samples/word_count.py:19-25`: lowercase, whitespace split,
  * strip `.,!?;:"'-` from token edges, drop empties) and bit-identical
  * to the composed `split/lower/trim` SQL-function form they replace —
  * every step runs the same UTF8String primitive Spark's own
  * expressions call (`toLowerCase`, `split`, `trim(trimString)`,
  * `concatWs`), just fused into one flat loop per row with no
  * per-element lambda dispatch and no risk of CollapseProject inlining
  * an upstream projection into an O(n²) lambda re-evaluation.
  */
object GraftText {
  private val Whitespace = UTF8String.fromString("\\s+")
  private val Punct = UTF8String.fromString(TextFunctions.PunctChars)
  private val Space = UTF8String.fromString(" ")
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Lowercased, punctuation-trimmed, non-empty token array. */
  def tokens(text: UTF8String): ArrayData = {
    val parts = text.toLowerCase.split(Whitespace, -1)
    val out = new Array[Any](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i).trim(Punct)
      if (t.numBytes() > 0) { out(n) = t; n += 1 }
      i += 1
    }
    if (n == parts.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], n))
  }

  /** Word n-gram shingles (tokens joined with single spaces). */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return Empty
    val out = new Array[Any](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Native k-means assignment kernels — the runtime twins of the
  * `least()`-over-(‖c‖²−2·v·c, j)-structs folds the k-means family
  * composed from `graft_dot` before round 15. The composed form embeds
  * the per-centroid ‖c‖² DOUBLES as codegen source literals, so every
  * Lloyd iteration (new centroids → new constants → new source) forced
  * a fresh multi-10-KB janino compile of the k×dims expression tree; the
  * kernel rides the codebook as a reference object (the
  * [[GraftPq]] pattern), so the generated source is byte-identical
  * across iterations, queries, and k — one compile per JVM, ever.
  *
  * Bit-compatibility contract (oracle parity depends on it):
  *  - score s_j = cc_j − 2.0·dot(v, c_j); dot is the same
  *    left-to-right `(double) v[i] * c_j[i]` accumulation as
  *    [[graft.plans.DotProductF64]], over min(len(v), len(c_j))
  *    elements; cc_j is the caller's `foldLeft(0.0)(acc + x*x)`.
  *  - selection replicates Spark's struct ordering on (s, j): doubles
  *    compare with `==` first (so -0.0 ties 0.0) then
  *    `java.lang.Double.compare` (NaN greatest), ties break to the
  *    LOWER index — exactly `least()` / `array_sort` on (s, c) structs.
  *  - a null vector replicates the fold's all-null-scores tie: index 0
  *    (first nProbes indices for the probe form, null cosine for the
  *    cos form).
  */
object GraftKmeans {

  private def score(v: ArrayData, c: Array[Double], cc: Double): Double = {
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += v.getFloat(i).toDouble * c(i); i += 1 }
    cc - 2.0 * dot
  }

  // Spark's nan-safe double ordering: == first (-0.0 ties 0.0), then
  // java.lang.Double.compare (NaN greatest, NaN == NaN)
  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  def argmin(v: ArrayData, cb: Array[Array[Double]], cc: Array[Double]): Int = {
    if (v == null) return 0
    var best = 0
    var bestS = score(v, cb(0), cc(0))
    var j = 1
    while (j < cb.length) {
      val s = score(v, cb(j), cc(j))
      if (cmpD(s, bestS) < 0) { best = j; bestS = s }
      j += 1
    }
    best
  }

  /** The `nProbes` nearest cell indices, ascending by (s, j) — the
    * multi-probe generalization ([[argmin]] is nProbes = 1).
    */
  def probeCells(v: ArrayData, cb: Array[Array[Double]], cc: Array[Double],
                 nProbes: Int): ArrayData = {
    val k = cb.length
    val take = math.min(nProbes, k)
    if (v == null) return new GenericArrayData(Array.tabulate(take)(identity))
    val s = new Array[Double](k)
    var j = 0
    while (j < k) { s(j) = score(v, cb(j), cc(j)); j += 1 }
    val idx = Array.tabulate(k)(identity)
    // full argsort by (s, j) — k is codebook-sized (≤ a few hundred);
    // matches array_sort over the (s, c) structs exactly
    val boxed = idx.map(Int.box)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = cmpD(s(a), s(b))
        if (c != 0) c else Integer.compare(a, b)
      }
    })
    new GenericArrayData(boxed.take(take).map(_.intValue))
  }

  /** Argmin index plus the cosine of the vector against the WINNING
    * centroid (unrounded — callers apply Spark `round`), replicating
    * the (s, c, cos) struct fold of prototypeScores: cos =
    * dot / (sqrt(v·v) · sqrt(cc)), the self-dot accumulated over the
    * float-widened elements exactly like the cast-composed form.
    */
  def argminCos(v: ArrayData, cb: Array[Array[Double]], cc: Array[Double],
                sqrtCc: Array[Double]): GenericInternalRow = {
    if (v == null) return new GenericInternalRow(Array[Any](0, null))
    val best = argmin(v, cb, cc)
    val c = cb(best)
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += v.getFloat(i).toDouble * c(i); i += 1 }
    var selfDot = 0.0
    i = 0
    val nv = v.numElements()
    while (i < nv) {
      val d = v.getFloat(i).toDouble
      selfDot += d * d
      i += 1
    }
    val cos = dot / (java.lang.Math.sqrt(selfDot) * sqrtCc(best))
    new GenericInternalRow(Array[Any](best, cos))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData

/** Static kernel behind graft.plans.MaxCosineBroadcast — the max-cos
  * scan of one vector against the broadcast eval set.
  *
  * Bit-compatibility contract (pinned by StreamingSpec's parity test
  * against the batch decontaminateSemantic):
  *   - each cosine is the CosineSimilarity fused pass verbatim (one
  *     left-to-right loop accumulating dot + both norms in double);
  *   - rounding to 6 decimals happens BEFORE the max, with the same
  *     HALF_UP BigDecimal path Spark's `round(col, 6)` takes on a
  *     double — so two evals tied at 6dp resolve to the LOWER id,
  *     matching the batch `max(struct(cos, -eval_id))` tie rule.
  */
object VectorGate {
  def maxCos(v: ArrayData, ids: Array[Long], vecs: Array[Array[Float]]): InternalRow = {
    var bestCos = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var j = 0
    while (j < vecs.length) {
      val y = vecs(j)
      val n = math.min(v.numElements(), y.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = v.getFloat(i).toDouble
        val yi = y(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val raw = dot / (math.sqrt(na) * math.sqrt(nb))
      // Spark's round() passes NaN/Infinity through unrounded
      // (BigDecimal.valueOf would throw) — a zero vector on either
      // side cosines to NaN, and the batch operator emits it
      val c = if (raw.isNaN || raw.isInfinite) raw
        else java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // Double.compare = Spark's double ordering (NaN greatest,
      // NaN == NaN) — matches the batch max(struct(cos, -id)) exactly
      val cmp = java.lang.Double.compare(c, bestCos)
      if (cmp > 0 || (cmp == 0 && ids(j) < bestId)) {
        bestCos = c; bestId = ids(j)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCos, bestId))
  }

  /** Nearest-centroid argmax against a broadcast codebook — the
    * zero-shuffle IVF cell assignment behind
    * graft.plans.ArgMaxCosineBroadcast. Bit-replicates the window
    * form `row_number() OVER (PARTITION BY id ORDER BY csim DESC,
    * centroid_id) = 1` that the DuckDB oracles pin:
    *   - each cosine is the CosineSimilarity fused pass verbatim,
    *     UNROUNDED (the window form compares raw doubles);
    *   - Double.compare = Spark's (and DuckDB's) sort order for
    *     doubles — NaN greatest, NaN == NaN — so a zero vector
    *     (cosine NaN on every centroid) resolves exactly like the
    *     window: NaN rows rank first under DESC, tie → lower id.
    */
  def argMaxCos(v: ArrayData, ids: Array[Long], vecs: Array[Array[Float]]): InternalRow = {
    var bestCos = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var j = 0
    while (j < vecs.length) {
      val y = vecs(j)
      val n = math.min(v.numElements(), y.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = v.getFloat(i).toDouble
        val yi = y(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      val cmp = java.lang.Double.compare(c, bestCos)
      if (cmp > 0 || (cmp == 0 && ids(j) < bestId)) {
        bestCos = c; bestId = ids(j)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCos, bestId))
  }

  /** Top-`nProbes` nearest centroids of one vector against the
    * broadcast codebook — the multi-probe sibling of [[argMaxCos]],
    * same ordering contract (unrounded cosines, Double.compare, ties
    * → lower id = the window form `crnk <= nProbes`). Insertion into
    * two nProbes-sized arrays: nProbes is small (≤ 8 in practice), so
    * the scan stays O(centroids × nProbes) with zero allocation per
    * candidate.
    */
  def topCells(v: ArrayData, ids: Array[Long], vecs: Array[Array[Float]],
               nProbes: Int): ArrayData = {
    val bc = new Array[Double](nProbes)
    val bi = new Array[Long](nProbes)
    var filled = 0
    var j = 0
    while (j < vecs.length) {
      val y = vecs(j)
      val n = math.min(v.numElements(), y.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = v.getFloat(i).toDouble
        val yi = y(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      var pos = filled
      while (pos > 0 && {
        val cmp = java.lang.Double.compare(c, bc(pos - 1))
        cmp > 0 || (cmp == 0 && ids(j) < bi(pos - 1))
      }) pos -= 1
      if (pos < nProbes) {
        var q = math.min(filled, nProbes - 1)
        while (q > pos) { bc(q) = bc(q - 1); bi(q) = bi(q - 1); q -= 1 }
        bc(pos) = c; bi(pos) = ids(j)
        if (filled < nProbes) filled += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOfRange(bi, 0, filled))
  }
}

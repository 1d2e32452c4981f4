package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.plans.GraftFunctions

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline; the
  * random-hyperplane LSH variant is the 100 TB path: bucket keys are
  * computed map-side from deterministic (hash-derived) planes, then the
  * candidate join is bucket-partitioned — comparisons scale with bucket
  * occupancy, not n².
  */
object Similarity {

  /** C5: near-duplicate pairs by cosine ≥ threshold (brute force over
    * the id-ordered pair space — quadratic verifier / small tables).
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     minCosine: Double): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val a = emb.select(col(idCol).as("vec_a"), col(vecCol).as("va")).repartition()
    val b = emb.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorFunctions.cosineNative(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** C6: brute-force cosine top-k neighbors for a query subset.
    * The per-query top-k is a rank window partitioned by query id —
    * scales with queries × corpus via the broadcast of the query side.
    */
  def knnBruteForce(emb: DataFrame, idCol: String, vecCol: String,
                    nQueries: Int, k: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")).repartition()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.cosineNative(col("qv"), col("nv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Deterministic pseudo-random hyperplane: md5-derived components in
    * [-0.5, 0.5), computed driver-side once (they are constants) and
    * shipped as array literals — the projection itself is the native
    * codegen'd `graft_dot`, so bucketing runs at scan rate.
    */
  private[operators] def planeVec(plane: Int, dims: Int): Array[Double] = {
    val mdI = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims) { d =>
      val hex = mdI.digest(s"plane$plane:$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble / 1000000.0 - 0.5
    }
  }

  /** LSH bucket signature: sign bits of projections onto `nPlanes`
    * deterministic hyperplanes.
    */
  def lshBucket(vecCol: Column, nPlanes: Int, dims: Int, planeOffset: Int = 0): Column = {
    val proj = (0 until nPlanes).map { p =>
      val dotP = call_function("graft_dot", vecCol,
        typedLit(planeVec(planeOffset + p, dims).toSeq))
      when(dotP >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    proj.reduce(_ + _)
  }

  /** IVF-style ANN: a deterministic subsample acts as the centroid
    * codebook (`vec_id % centroidMod == 0`), every vector is assigned
    * to its nearest centroid (one broadcast pass), and queries probe
    * only their own centroid's inverted list. At 100 TB the codebook
    * stays broadcast-sized while the assignment and probe stages are
    * embarrassingly parallel scans; `nProbes` >1 would trade compute
    * for recall (kept at 1 here — recall is spec-measured vs C6).
    */
  def knnIvf(emb: DataFrame, idCol: String, vecCol: String,
             nQueries: Int, k: Int, centroidMod: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(emb.sparkSession)
    val centroids = emb.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))
    def assign(df: DataFrame, id: String, vec: String): DataFrame = {
      val wa = Window.partitionBy(col(id))
        .orderBy(col("csim").desc, col("centroid_id"))
      df.join(broadcast(centroids))
        .select(col(id), col(vec),
          col("centroid_id"),
          VectorFunctions.cosineNative(col(vec), col("cv")).as("csim"))
        .withColumn("crnk", row_number().over(wa))
        .filter(col("crnk") === 1)
        .select(col(id), col(vec), col("centroid_id"))
    }
    val corpus = assign(
      emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")).repartition(),
      "neighbor_id", "nv")
    val queries = assign(
      emb.filter(col(idCol) < nQueries).select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.cosineNative(col("qv"), col("nv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** C7: ANN via multi-table random-hyperplane LSH — `nTables`
    * independent hash tables (distinct plane sets, offset seeds);
    * candidates are the UNION of bucket-mates across tables (the
    * standard recall lever: collision probability compounds per
    * table), then exact cosine + top-k. All bucket signatures are
    * computed in one map pass; the join is bucket-partitioned.
    */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
             nQueries: Int, k: Int, nPlanes: Int = 5, nTables: Int = 8,
             dims: Int = 64): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val tableBuckets = (0 until nTables).map { t =>
      struct(lit(t).as("table"),
        lshBucket(col(vecCol), nPlanes, dims, planeOffset = t * nPlanes).as("bucket"))
    }
    val bucketed = emb.select(col(idCol), col(vecCol),
      explode(array(tableBuckets: _*)).as("tb"))
      .select(col(idCol), col(vecCol), col("tb.table"), col("tb.bucket"))
    val queries = bucketed.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("table"), col("bucket"))
    val corpus = bucketed
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("table"), col("bucket"))
      .repartition()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("nv"))
      .distinct()  // union across tables
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.cosineNative(col("qv"), col("nv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}

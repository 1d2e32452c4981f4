package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

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
    val a = emb.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorFunctions.cosine(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** C6: brute-force cosine top-k neighbors for a query subset.
    * The per-query top-k is a rank window partitioned by query id —
    * scales with queries × corpus via the broadcast of the query side.
    */
  def knnBruteForce(emb: DataFrame, idCol: String, vecCol: String,
                    nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.cosine(col("qv"), col("nv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component: hash-derived
    * value in [-0.5, 0.5). Reproducible anywhere (md5-based).
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (conv(substring(md5(concat(lit(s"plane$plane:"), dim.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 1000000L).cast("double") / 1000000.0 - 0.5

  /** LSH bucket signature: sign bits of projections onto `nPlanes`
    * deterministic hyperplanes.
    */
  def lshBucket(vecCol: Column, nPlanes: Int): Column = {
    val proj = (0 until nPlanes).map { p =>
      val dotP = aggregate(
        zip_with(transform(vecCol, x => x.cast("double")),
          sequence(lit(0), size(vecCol) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dotP >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    proj.reduce(_ + _)
  }

  /** C7: ANN via random-hyperplane LSH — candidates share a bucket;
    * top-k within bucket. Recall vs C6 is spec-checked (SimilaritySpec).
    */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
             nQueries: Int, k: Int, nPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = emb.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val queries = bucketed.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"))
    val corpus = bucketed
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.cosine(col("qv"), col("nv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}

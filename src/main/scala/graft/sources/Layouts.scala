package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers — where 100 TB performance is actually won:
  *
  * - **Partitioned layout**: directory partitioning by a low-cardinality
  *   column; equality/range predicates prune entire directories before
  *   any I/O (`PartitionFilters` in the scan node).
  * - **Bucketed layout**: pre-shuffled by join/agg key at write time;
  *   joins and aggregations on the bucket key skip the exchange
  *   entirely (co-located join).
  */
object Layouts {

  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write as a bucketed managed table (requires a warehouse-enabled
    * session). `nBuckets` should match downstream shuffle parallelism.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}

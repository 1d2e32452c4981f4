package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's star schema + text/vector tables.
  *
  * One parquet file per table under an `sf` directory (TESTDATA.md).
  * Reads are plain `spark.read.parquet` so Catalyst pushes filters and
  * prunes columns into the scan; at 100 TB the same code reads a
  * partitioned parquet/lakehouse layout unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Session conf required to read TIMESTAMP(NANOS) parquet; there is
    * no per-read DataSource option for it, so graft's session builders
    * (GraftSession, Verify, Bench, specs) set it at build time.
    */
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (reads as BIGINT under `nanosAsLong`)
    * and timestamp[us] (reads as TIMESTAMP_NTZ, or TIMESTAMP for
    * tz-adjusted files). A 100 TB lake holds mixed-encoding files as a
    * matter of course, so the loader branches on the *observed* schema
    * instead of assuming one generation:
    *   - LongType        → nanos: truncate to micros (session TZ is UTC,
    *                       matching the file's naive-UTC semantics)
    *   - Timestamp(NTZ)  → cast to session-local timestamp (UTC session,
    *                       so the naive values are preserved verbatim)
    * Either way consumers see one stable `ts: timestamp` column.
    * The conf set here is a no-op guard for foreign sessions — every
    * graft-built session already pins it at build time (value is
    * constant, so concurrent loaders can't race to different states).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    if (!s.conf.getOption(NanosAsLong).contains("true"))
      s.conf.set(NanosAsLong, "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        raw
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported parquet type $other (expected INT64 nanos, timestamp, or timestamp_ntz)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** `embeddings.embedding` has shipped as `list<float>` in every
    * driver generation so far, but the same vector lake could ship
    * `list<double>` (numpy's float64 default) after a regeneration —
    * the events-ts lesson applied BEFORE it burns: every graft vector
    * kernel reads float slots (`ArrayData.getFloat`), which silently
    * misreads a double-backed array rather than failing. Branch on the
    * observed element type and normalize to `array<float>`; anything
    * else is rejected with a clear error.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val raw = load(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case ArrayType(DoubleType, _) =>
        raw.withColumn("embedding", col("embedding").cast("array<float>"))
      case other =>
        throw new IllegalArgumentException(
          s"embeddings.embedding: unsupported parquet type $other " +
            "(expected array<float> or array<double>)")
    }
  }

  /** Register all tables as temp views for `spark.sql` users
    * (events goes through its nanosecond-timestamp wrapper).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers over the [[graft.plans.KMinByHash]] portable sketch
  * aggregate, plus the DuckDB SQL twins the oracle uses (kept adjacent
  * so both engines' formulas evolve together — every constant below
  * appears verbatim in both).
  *
  * Requires `GraftFunctions.register(spark)` (GraftSession sessions get
  * it via GraftExtensions).
  */
object Sketches {
  /** Max value of the 60-bit portable hash space as an exact double. */
  private val HashSpace = 1.152921504606846976e18 // 2^60

  /** `array<payload>` of the k smallest distinct hashes' payloads in
    * ascending hash order (ties on hash keep the minimum payload).
    */
  def kminBy(h: Column, payload: Column, k: Int): Column =
    call_function("graft_kmin_by", h, payload, lit(k))

  /** KMV distinct-count estimate from `kminBy(h, h, k)`: exact below k
    * distinct values, `floor((k-1)·2^60 / h_k)` at or above (both
    * branches integer-valued, so the DuckDB twin matches bit-for-bit).
    */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * HashSpace)
        / element_at(kmv, k).cast("double")).cast("long"))

  /** Median of a deterministic min-hash row sample (`kminBy(rowHash,
    * value, k)`): sort the sample, average the middle one/two. Plain
    * IEEE ops only — reproducible anywhere.
    */
  def sampleMedian(sample: Column): Column = {
    val sa = sort_array(sample)
    val n = size(sa)
    val lo = element_at(sa, floor((n + lit(1)) / lit(2)).cast("int"))
    val hi = element_at(sa, floor((n + lit(2)) / lit(2)).cast("int"))
    // Empty sketch (group whose hash/value inputs were all NULL) →
    // NULL, not an element_at(…, 0) runtime error. For oracle-checked
    // queries, FILTER such groups out before reading the sketch (as
    // Relational.qApproxStats/qPortableQuantiles do): the SQL twins'
    // pre-aggregation WHERE means the group row doesn't exist on the
    // oracle side at all, so a NULL row here would hash-mismatch.
    when(n === 0, lit(null)).otherwise((lo + hi) / lit(2.0))
  }

  /** Arbitrary quantile of the sample: average of the two nearest-rank
    * order statistics around `(n-1)·q` (equals [[sampleMedian]] at
    * q = 0.5). Same floor/ceil/average ops in the SQL twin.
    */
  def sampleQuantile(sample: Column, q: Double): Column = {
    val sa = sort_array(sample)
    val n = size(sa)
    val lo = element_at(sa, (floor((n - lit(1)) * lit(q)) + lit(1)).cast("int"))
    val hi = element_at(sa, (ceil((n - lit(1)) * lit(q)) + lit(1)).cast("int"))
    // see sampleMedian: empty sketch → NULL, never element_at(…, 0)
    when(n === 0, lit(null)).otherwise((lo + hi) / lit(2.0))
  }

  /** DuckDB twin of a set of [[sampleQuantile]]s over the same k-row
    * min-hash sample: one row per `grp` with a column per (name, q).
    */
  def sampleQuantilesSql(tbl: String, grp: String, hashExpr: String,
                         valExpr: String, k: Int,
                         qs: Seq[(String, Double)]): String = {
    val cols = qs.map { case (name, q) =>
      s"""(list_sort(list(v))[cast(floor((count(*) - 1) * $q) + 1 AS int)] +
         |   list_sort(list(v))[cast(ceil((count(*) - 1) * $q) + 1 AS int)]) / 2.0 AS $name""".stripMargin
    }.mkString(",\n  ")
    s"""SELECT $grp,
       |  $cols
       |FROM (
       |  SELECT $grp, v, row_number() OVER (PARTITION BY $grp ORDER BY h) AS rn
       |  FROM (SELECT $grp, ${PortableHash.duckdb(s"cast($hashExpr AS varchar)")} AS h,
       |          min($valExpr) AS v
       |        FROM $tbl WHERE $hashExpr IS NOT NULL AND $valExpr IS NOT NULL
       |        GROUP BY $grp, h))
       |WHERE rn <= $k GROUP BY $grp""".stripMargin
  }

  // ---- DuckDB oracle twins -------------------------------------------------

  /** KMV estimate over `tbl`, one row per `grp`: k smallest distinct
    * portable hashes of `expr` via ROW_NUMBER, same estimate formula.
    */
  def kmvEstimateSql(tbl: String, grp: String, expr: String, k: Int): String =
    s"""SELECT $grp, CASE WHEN count(*) < $k THEN count(*)
       |  ELSE cast(floor(${(k - 1).toDouble} * 1.152921504606846976e18
       |            / cast(max(CASE WHEN rn = $k THEN h END) AS double)) AS bigint)
       |  END AS kmv_users
       |FROM (
       |  SELECT $grp, h, row_number() OVER (PARTITION BY $grp ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT $grp, ${PortableHash.duckdb(s"cast($expr AS varchar)")} AS h
       |        FROM $tbl WHERE $expr IS NOT NULL))
       |WHERE rn <= $k GROUP BY $grp""".stripMargin

  /** Sample-median over `tbl`, one row per `grp`: k smallest distinct
    * row hashes (min payload on hash ties), then the same
    * middle-one/two average.
    */
  def sampleMedianSql(tbl: String, grp: String, hashExpr: String,
                      valExpr: String, k: Int): String =
    s"""SELECT $grp,
       |  (list_sort(list(v))[cast(floor((count(*) + 1) / 2) AS int)] +
       |   list_sort(list(v))[cast(floor((count(*) + 2) / 2) AS int)]) / 2.0 AS sample_median
       |FROM (
       |  SELECT $grp, v, row_number() OVER (PARTITION BY $grp ORDER BY h) AS rn
       |  FROM (SELECT $grp, ${PortableHash.duckdb(s"cast($hashExpr AS varchar)")} AS h,
       |          min($valExpr) AS v
       |        FROM $tbl WHERE $hashExpr IS NOT NULL AND $valExpr IS NOT NULL
       |        GROUP BY $grp, h))
       |WHERE rn <= $k GROUP BY $grp""".stripMargin
}

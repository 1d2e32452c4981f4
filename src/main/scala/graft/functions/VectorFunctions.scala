package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Composed from higher-order SQL functions (`zip_with` + `aggregate`)
  * so Catalyst codegens the loop; elements are cast to double before
  * multiplication so the arithmetic (and its left-to-right accumulation
  * order) matches the DuckDB oracle exactly. A native Catalyst
  * `Expression` with `doGenCode` (see graft.plans.CosineSimilarity)
  * is the faster hot path used by the Similarity operators.
  */
object VectorFunctions {
  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd single-pass cosine (graft.plans.CosineSimilarity) —
    * bit-identical to [[cosine]]; requires
    * `GraftFunctions.register(spark)` first (operators do this).
    */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** DuckDB fragments over list<float> expressions (double math, same
    * sequential accumulation as the Spark `aggregate` fold).
    */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE), (x, y) -> x + y)"
  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"
}

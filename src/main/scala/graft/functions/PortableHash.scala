package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * The driver's correctness oracle re-runs each query in DuckDB, so any
  * hash that participates in results (dedup keys, minhash signatures,
  * simhash bits, LSH buckets) must produce bit-identical values in both
  * engines. Spark's `hash`/`xxhash64` and DuckDB's `hash` differ, so we
  * derive a 60-bit integer from the md5 hex digest — md5 is identical
  * everywhere, and 15 hex chars (60 bits) always fit a signed Long.
  *
  * Spark side:  `conv(substring(md5(x), 1, 15), 16, 10)` cast to long.
  * DuckDB side: `cast('0x' || substr(md5(x), 1, 15) as bigint)`.
  *
  * At 100 TB scale md5-per-token is pure map-side compute inside
  * whole-stage codegen — no shuffle implications.
  */
object PortableHash {
  /** 60-bit non-negative hash of the (string) column. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member `i` (for minhash). */
  def portableHash(c: Column, seed: Int): Column =
    portableHash(concat_ws(":", lit(seed.toString), c))

  /** DuckDB SQL fragment equivalents (kept adjacent so they evolve together). */
  def duckdb(expr: String): String =
    s"cast('0x' || substr(md5($expr), 1, 15) as bigint)"
  def duckdb(expr: String, seed: Int): String =
    duckdb(s"concat('$seed', ':', $expr)")
}

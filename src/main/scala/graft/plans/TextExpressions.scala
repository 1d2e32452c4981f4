package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize/shingle expressions for the dedup scan path.
  *
  * The composed HOF form (`filter(transform(split(...)))`) evaluates
  * its lambdas interpreted, and Catalyst's CollapseProject can inline a
  * token-array projection INTO a downstream lambda so it re-evaluates
  * per element — O(tokens²) per document. These expressions keep the
  * whole row inside the surrounding codegen stage and delegate to one
  * flat kernel call per row (graft.functions.GraftText), which is the
  * scan-rate path minhash/simhash dedup needs at 100 TB.
  */
case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.tokens($c);")
}

/** One-pass quality-stats struct over raw text (GraftText.qualityStats):
  * (n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
  * quality_score). Field extraction downstream is GetStructField; with
  * subexpression elimination the kernel runs once per row even when all
  * six fields are selected.
  */
case class QualityStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_chars",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("avg_token_len",
      org.apache.spark.sql.types.DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("punct_ratio",
      org.apache.spark.sql.types.DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("stopword_ratio",
      org.apache.spark.sql.types.DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("quality_score",
      org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def prettyName: String = "graft_quality_stats"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.qualityStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.qualityStats($c);")
}

/** Zero-shuffle token-diversity struct over raw text
  * (GraftText.tokenDiversityStats): (n_tokens, distinct_tokens,
  * top_share, simpson_diversity) from a per-row sorted-run walk — the
  * map-side form of the (doc, token) count-then-aggregate shuffle.
  */
case class TokenDiversityExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("distinct_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_share",
      org.apache.spark.sql.types.DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("simpson_diversity",
      org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def prettyName: String = "graft_token_diversity"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.tokenDiversityStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.tokenDiversityStats($c);")
}

case class CdcChunksExpr(child: Expression, anchorMod: Int) extends UnaryExpression {
  require(anchorMod >= 1)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.cdcChunks(input.asInstanceOf[ArrayData], anchorMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.cdcChunks($c, $anchorMod);")
}

case class WinnowFpsExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  require(n >= 1 && w >= 1)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.winnowFps(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.winnowFps($c, $n, $w);")
}

/** Positionwise minhash-signature agreement count (two array<long>
  * children → int) — the codegen'd candidate-pair filter. Runs on
  * every pair the LSH band-bucket join emits, which on a
  * heavy-candidate corpus is the join's hot inner loop; the
  * `aggregate(zip_with(...))` HOF form evaluates interpreted.
  */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sig_agree"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftText.sigAgree(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftText.sigAgree($a, $b);")
}

/** RFC 9309 robots path-pattern match (path, pattern → boolean) —
  * `*` any-run wildcard + trailing-`$` end anchor, prefix semantics
  * otherwise (GraftText.robotsMatch). Native so the per-URL × per-rule
  * evaluation inside the broadcast robots filter is one flat byte-walk
  * kernel call (evaluated inside the rules-array HOF lambda, which
  * Spark runs interpreted — the win is the kernel itself, not codegen
  * placement): the regex-translation alternative (`regexp_like` on a
  * per-rule pattern column) recompiles the pattern per array element
  * per row — a frontier-scale cost for semantics a two-pointer walk
  * covers exactly. doGenCode is provided for any non-HOF use.
  */
case class RobotsMatchExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_robots_match"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(path: Any, pat: Any): Any =
    graft.functions.GraftText.robotsMatch(
      path.asInstanceOf[UTF8String], pat.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftText.robotsMatch($a, $b);")
}

/** Winning robots rule per (path, host-rule-array) — the whole
  * filter-by-match / project-to-sortable-struct / array_max winner
  * selection as one kernel call (GraftText.robotsWinner). The HOF
  * composition it replaces ran INTERPRETED per frontier URL (higher-
  * order functions never enter whole-stage codegen): per-rule lambda
  * dispatch, a filtered-array + per-matching-rule struct allocation,
  * then an interpreted struct-ordering max. Output struct and winner
  * semantics are bit-identical (HtmlSpec pins native ≡ composed on the
  * fixture rules and on adversarial tie/wildcard/anchor cases).
  */
case class RobotsWinnerExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("l", IntegerType, nullable = false),
    StructField("pref", IntegerType, nullable = false),
    StructField("rpath", StringType, nullable = true),
    StructField("rtype", StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_winner"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(path: Any, rules: Any): Any =
    graft.functions.GraftText.robotsWinner(
      path.asInstanceOf[UTF8String], rules.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the kernel returns null for a no-match row even when both inputs
    // are non-null, so isNull must be re-derived from the result (the
    // plain nullSafeCodeGen contract assumes kernels never do that)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.GraftText.robotsWinner($a, $b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
}

case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.shingles($c, $n);")
}

/** Unicode NFC normalization of a string column (GraftText.nfc — the
  * JDK Normalizer; DuckDB's `nfc_normalize` twin agrees
  * byte-for-byte). Codegen'd so the cleanup scan stays inside the
  * surrounding whole-stage; already-NFC text passes through without
  * allocation.
  */
case class NfcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.nfc($c);")
}

/** Per-document n-gram repetition stats struct (GraftText.gramStats):
  * (top2_gram, top2_count, top3_gram, top3_count, dup5_chars) from one
  * sorted-run walk per row — the map-side form of the (doc, n, gram)
  * count-shuffle formulation (kept in TextAnalysis as the parity
  * reference).
  */
case class GramStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("top2_gram", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("top2_count",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top3_gram", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("top3_count",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("dup5_chars",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_gram_stats"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.gramStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.gramStats($c);")
}

/** Single-pass mojibake repair struct over raw text
  * (GraftText.mojibakeFix): (repaired, n_artifacts) — the fused form of
  * C104's 16 chained replaces + 16 length-census scans. ASCII rows
  * (byte length == char length) return the input buffer unchanged.
  */
case class MojibakeFixExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("repaired", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_artifacts",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_mojibake_fix"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    graft.functions.GraftText.mojibakeFix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftText.mojibakeFix($c);")
}

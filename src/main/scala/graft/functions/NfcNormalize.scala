package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (java.text.Normalizer) — the
  * curation stage that makes dedup keys, shingles, and token stats
  * stop treating "é" (NFC) and "e"+U+0301 (NFD) as different content.
  * Round 15 adds the `form` parameter: NFKC additionally folds
  * COMPATIBILITY characters — fullwidth forms (Ａ→A), ligatures
  * (ﬁ→fi), signs (™→TM) — the dominant normalization twins in
  * multilingual crawl data that canonical NFC leaves distinct.
  *
  * A custom Catalyst Expression (build-brief preference b): one static
  * JDK call inside whole-stage codegen, no UDF boxing, null-intolerant
  * like the string builtins. Cross-engine contract: the JDK and
  * DuckDB's utf8proc implement the same Unicode normalization
  * algorithm — pipeline_unicode_census hash-pins the NFC agreement;
  * DuckDB has no NFKC function, so pipeline_nfkc_census pins the JDK
  * against hand-derived expansions of the planted compatibility set.
  */
case class NfcNormalize(child: Expression, form: String = "NFC")
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | NullType =>
      if (NfcNormalize.Forms.contains(form)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form'; valid: ${NfcNormalize.Forms.keys.mkString(", ")}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc requires a string argument, got $t")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.NfcNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** The JDK forms exposed; keyed by the literal the expression and
    * the codegen string carry (enum resolved once here, not per row). */
  private[functions] val Forms: Map[String, java.text.Normalizer.Form] = Map(
    "NFC" -> java.text.Normalizer.Form.NFC,
    "NFD" -> java.text.Normalizer.Form.NFD,
    "NFKC" -> java.text.Normalizer.Form.NFKC,
    "NFKD" -> java.text.Normalizer.Form.NFKD)

  /** Static entry shared by interpreted + codegen'd paths. Fast path:
    * Normalizer.isNormalized is a cheap scan that avoids allocating
    * for the (overwhelmingly common) already-normalized string. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Back-compat static used by previously generated code / specs. */
  def nfc(s: UTF8String): UTF8String = normalize(s, "NFC")

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private def ensureRegistered(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc", exprs => NfcNormalize(exprs(0)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfkc", exprs => NfcNormalize(exprs(0), "NFKC"), "scala_udf")
    }

  /** Column API: nfc(s). Registers the expression in the session's
    * function registry on first use (also exposing SQL `nfc`/`nfkc`). */
  def nfc(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark)
    call_function("nfc", c)
  }

  /** Column API: nfkc(s) — compatibility normalization. */
  def nfkc(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark)
    call_function("nfkc", c)
  }
}

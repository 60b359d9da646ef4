package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (java.text.Normalizer) — the
  * curation stage that makes dedup keys, shingles, and token stats
  * stop treating "é" (NFC) and "e"+U+0301 (NFD) as different content.
  *
  * A custom Catalyst Expression (build-brief preference b): one static
  * JDK call inside whole-stage codegen, no UDF boxing, null-intolerant
  * like the string builtins. Cross-engine contract: the JDK and
  * DuckDB's utf8proc implement the same Unicode normalization
  * algorithm — pipeline_unicode_census hash-pins the agreement on the
  * fixture's composed/decomposed Latin sequences at all three SFs.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc requires a string argument, got $t")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any = NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry shared by interpreted + codegen'd paths. Fast path:
    * Normalizer.isNormalized is a cheap scan that avoids allocating
    * for the (overwhelmingly common) already-NFC string. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Column API: nfc(s). Registers the expression in the session's
    * function registry on first use (also exposing SQL `nfc`). */
  def nfc(spark: SparkSession, c: Column): Column = {
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc", exprs => NfcNormalize(exprs(0)), "scala_udf")
    }
    call_function("nfc", c)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization pass every web-crawl corpus build runs before any
  * text hashing or dedupe (decomposed accents, compatibility clones and
  * mojibake artifacts otherwise make byte-identical sentences hash
  * apart). Spark has no built-in normalizer function; a Scala UDF would
  * fall out of whole-stage codegen, so this wraps `java.text.Normalizer`
  * (ICU-free, deterministic across JVMs for a fixed Unicode version) in
  * a UnaryExpression with both interpreted and codegen paths.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation for
  * already-NFC text (the overwhelming case in a real corpus), so clean
  * documents pay one scan and zero copies — the UTF8String is returned
  * as-is. The DuckDB oracle twin is `nfc_normalize()`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires string input, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by the interpreted and generated paths. Returns the input
    * object unchanged (no copy) when the text is already NFC. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(text: Column): Column =
    ExprBridge.col(NfcNormalize(ExprBridge.expr(text)))
}

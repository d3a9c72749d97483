package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonical-composition pass a text-ingest pipeline runs before hashing
  * or deduplicating (the same logical text arrives both precomposed and
  * decomposed from different converters; md5/minhash treat them as
  * different documents unless normalized first — see q_text_normalize).
  *
  * `java.text.Normalizer` implements the Unicode canonical composition
  * that DuckDB's `nfc_normalize` (utf8proc) also implements, which is what
  * lets the oracle replay this expression exactly. The generated code is
  * the same single static call as the interpreted path. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column = Shim.column(NfcNormalize(Shim.expression(c)))
}

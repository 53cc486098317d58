package graft.exprs

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus cleaning — the standard first pass of
  * a web-scale text pipeline (fold fullwidth forms, compose combining
  * marks, strip diacritics) so that downstream dedup/fingerprint keys
  * compare canonical bytes, not encoding accidents.
  *
  * Forms: NFC / NFD / NFKC / NFKD (java.text.Normalizer — the Unicode
  * reference algorithm, identical canonical tables as DuckDB's
  * `nfc_normalize`), plus STRIP_ACCENTS = NFD → drop combining marks →
  * NFC (matches DuckDB `strip_accents`).
  */
case class UnicodeNormExpr(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  require(UnicodeNormExpr.forms.contains(form),
    s"normalize_unicode: unknown form '$form' (${UnicodeNormExpr.forms.mkString("/")})")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(UnicodeNormExpr.normalize(s, form))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormExpr =
    copy(child = newChild)
}

object UnicodeNormExpr {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD", "STRIP_ACCENTS")

  private val marks = "\\p{Mn}+".r

  def normalize(s: String, form: String): String = form match {
    case "STRIP_ACCENTS" =>
      Normalizer.normalize(
        marks.replaceAllIn(Normalizer.normalize(s, Normalizer.Form.NFD), ""),
        Normalizer.Form.NFC)
    case f =>
      Normalizer.normalize(s, Normalizer.Form.valueOf(f))
  }

  def column(c: Column, form: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      UnicodeNormExpr(org.apache.spark.sql.GraftBridge.expression(c), form))
}

package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression — the canonical first step of any text-cleaning
  * pipeline (the same logical document arrives as precomposed or
  * combining-sequence codepoints depending on the source, and every
  * downstream exact-match operator — fingerprints, dedup keys,
  * inverted-index terms — silently misses unless the corpus is
  * normalized first).
  *
  * Spark has no builtin for this; the alternative is a Scala UDF,
  * which breaks whole-stage codegen and pays serialization per row.
  * This expression stays inside the generated plan and calls the
  * JDK's `java.text.Normalizer` (no new dependency). The unavoidable
  * cost either way is one String materialization per row (Normalizer
  * wants a CharSequence, Spark rows hold UTF8String bytes); the fast
  * path below skips even that when the input is already-normalized
  * ASCII — the overwhelming majority of real corpora.
  */
case class NormalizeText(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], form.name())

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = NormalizeText.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = $cls.normalize($s, "${form.name()}");""")
  }

  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
}

object NormalizeText {

  /** Called from both interpreted eval and generated code. ASCII fast
    * path: 7-bit bytes are normalization-invariant under every form,
    * so the common case is a single byte scan — no String alloc. */
  def normalize(s: UTF8String, formName: String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val form = Normalizer.Form.valueOf(formName)
      val str = s.toString
      if (Normalizer.isNormalized(str, form)) s
      else UTF8String.fromString(Normalizer.normalize(str, form))
    }
  }

  private def formOf(name: String): Normalizer.Form =
    try Normalizer.Form.valueOf(name.toUpperCase(java.util.Locale.ROOT))
    catch { case _: IllegalArgumentException =>
      throw new IllegalArgumentException(
        s"graft_normalize: unknown form '$name' (NFC|NFD|NFKC|NFKD)")
    }

  /** Column API: `normalizeText($"body")` / `normalizeText($"body",
    * "NFKC")`. */
  def normalizeText(c: Column, form: String = "NFC"): Column =
    GraftBridge.column(
      NormalizeText(GraftBridge.expression(c), formOf(form)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass cores for the tokenizer/shingler expressions — standalone
  * object so generated Java calls them through static forwarders (the
  * WordSetHitsHelper convention). */
object TokenExprsHelper {

  /** Java-regex `\s` without UNICODE_CHARACTER_CLASS: exactly the six
    * ASCII characters [ \t\n\x0B\f\r]. All are single-byte in UTF-8,
    * and UTF-8 continuation bytes are >= 0x80, so a byte scan can
    * never split inside a multi-byte code point. */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c ||
      b == 0x0d

  /** Maximal non-whitespace runs of `s`, as zero-copy UTF8String
    * slices over one shared byte array.
    *
    * Equivalent by construction to
    * `filter(split(s, "\\s+", -1), t => t =!= "")`: `\s+` consumes
    * maximal whitespace runs, so the split pieces are exactly the
    * non-whitespace runs plus a possible leading "" (when `s` starts
    * with whitespace) and a trailing "" (limit -1 keeps it when `s`
    * ends with whitespace) — both removed by the filter. */
  def splitWs(s: UTF8String): ArrayData = {
    // getBytes returns the backing array itself when the string spans
    // it exactly; otherwise one copy — either way the token slices
    // below share it with no further copies.
    val b = s.getBytes
    val n = b.length
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (isWs(b(i))) inTok = false
      else if (!inTok) { inTok = true; count += 1 }
      i += 1
    }
    val out = new Array[AnyRef](count)
    var k = 0
    i = 0
    while (i < n) {
      if (!isWs(b(i))) {
        val start = i
        while (i < n && !isWs(b(i))) i += 1
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined n-gram shingles over a token array.
    *
    * Equivalent by construction to the composed form
    * `when(size(toks) >= n, transform(sequence(1, size - (n-1)),
    *   i => concat_ws(" ", slice(toks, i, n)))).otherwise(array())`:
    * same window count, same join order, and [[UTF8String.concatWs]]
    * is the exact runtime `concat_ws` delegates to (nulls skipped).
    * The composed form also yields [] for a NULL token array (size
    * returns null, the guard falls through to otherwise), so the
    * caller maps null input to [] — see [[WordShinglesNative]]. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(new Array[AnyRef](0))
    val space = UTF8String.fromString(" ")
    val m = len - n + 1
    val out = new Array[AnyRef](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        parts(j) =
          if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native whitespace tokenizer: one generated-Java byte scan replaces
  * `filter(split(lower(text), "\\s+"), t => t =!= "")` — ArrayFilter
  * is a CodegenFallback higher-order function, so the composed form
  * ran an INTERPRETED lambda per array element on every tokenize of
  * every row (the single hottest expression in the catalog: ~40 rows
  * tokenize the documents table). The caller keeps Spark's own
  * `lower()` in front (exact collation semantics unchanged); this
  * expression only splits. Value semantics are pinned in
  * TokenExprsSpec against the composed form. */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_tokens"

  override def nullSafeEval(input: Any): Any =
    TokenExprsHelper.splitWs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenExprsHelper.splitWs($s);")

  override protected def withNewChildInternal(
      newChild: Expression): WhitespaceTokens = copy(child = newChild)
}

/** Native word-shingler: one generated-Java loop replaces the
  * composed `transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, n)))` — ArrayTransform is CodegenFallback, and the
  * composed form additionally allocated a sliced copy of the token
  * array per shingle position (O(T·n) allocations per row). NULL
  * input yields [] (not null) to match the composed `when/otherwise`
  * guard exactly; see [[TokenExprsHelper.shingles]]. */
case class WordShinglesNative(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.sql}")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  // The composed form returns [] for null token arrays (the when()
  // guard's size(null) is null, so the otherwise() branch fires) —
  // replicate by handling null BEFORE the nullSafeEval short-circuit.
  override def nullable: Boolean = false

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(new Array[AnyRef](0))
    else TokenExprsHelper.shingles(v.asInstanceOf[ArrayData], n)
  }

  import org.apache.spark.sql.catalyst.expressions.codegen.Block._

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    val code =
      code"""
        ${childGen.code}
        $resultType ${ev.value} = ${childGen.isNull}
          ? new org.apache.spark.sql.catalyst.util.GenericArrayData(
              new Object[0])
          : graft.functions.TokenExprsHelper.shingles(
              ${childGen.value}, $n);
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordShinglesNative = copy(child = newChild)
}

object TokenExprs {
  /** Column API: maximal non-whitespace runs (see [[WhitespaceTokens]]). */
  def whitespaceTokens(lowered: Column): Column =
    GraftBridge.column(WhitespaceTokens(GraftBridge.expression(lowered)))

  /** Column API: space-joined n-gram shingles (see [[WordShinglesNative]]). */
  def wordShingles(toks: Column, n: Int): Column =
    GraftBridge.column(
      WordShinglesNative(GraftBridge.expression(toks), n))
}

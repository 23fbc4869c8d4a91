package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass membership counter core for [[WordSetHits]] — standalone
  * object so generated Java calls it through the static forwarder. */
object WordSetHitsHelper {

  /** Plan-literal lookup table: word → bitmask of the lists containing
    * it (a word may sit in several lists — "la" is both an es and an
    * fr marker). Keys are UTF8String so probe tokens compare without
    * a per-token String decode. ≤ 64 lists by construction. */
  final class Table(lists: IndexedSeq[IndexedSeq[String]])
      extends Serializable {
    require(lists.length <= 64, "WordSetHits supports at most 64 lists")
    val n: Int = lists.length
    @transient lazy val mask: java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long]()
      var i = 0
      while (i < lists.length) {
        lists(i).foreach { w =>
          val k = UTF8String.fromString(w)
          val prev = m.get(k)
          m.put(k, java.lang.Long.valueOf(
            (if (prev == null) 0L else prev.longValue) | (1L << i)))
        }
        i += 1
      }
      m
    }
  }

  /** Per-list OCCURRENCE counts (duplicates count — same semantics as
    * `size(filter(toks, t => array_contains(list, t)))`); null tokens
    * are skipped like the composed filter form skips them (a null
    * never equals a marker). */
  def compute(toks: ArrayData, t: Table): ArrayData = {
    val out = new Array[Long](t.n)
    val m = t.mask
    val len = toks.numElements()
    var i = 0
    while (i < len) {
      if (!toks.isNullAt(i)) {
        val v = m.get(toks.getUTF8String(i))
        if (v != null) {
          var bits = v.longValue
          while (bits != 0L) {
            out(java.lang.Long.numberOfTrailingZeros(bits)) += 1L
            bits &= bits - 1L
          }
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native codegen replacement for the per-list
  * `size(filter(toks, t => array_contains(list, t)))` pattern the
  * lang-ID / stopword-ratio family composed from HOFs: ONE hash-probe
  * pass over the token array yields ALL list counts, where the
  * composed form ran one INTERPRETED filter lambda per list
  * (ArrayFilter is CodegenFallback) with a linear array_contains scan
  * per token. Lists ride as a plan-literal table (the BpeEncode /
  * CentroidArgmax convention — IndexedSeq, so case-class equality and
  * semanticEquals/subexpression-elimination work).
  *
  * Output: array<long>, entry i = occurrences of tokens in list i. */
case class WordSetHits(child: Expression,
                       lists: IndexedSeq[IndexedSeq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.sql}")
    }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_set_hits"

  @transient private lazy val table: WordSetHitsHelper.Table =
    new WordSetHitsHelper.Table(lists)

  override def nullSafeEval(input: Any): Any =
    WordSetHitsHelper.compute(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("wordSetTable", table,
      classOf[WordSetHitsHelper.Table].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"""${ev.value} = graft.functions.WordSetHitsHelper
        .compute($arr, $tableRef);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordSetHits = copy(child = newChild)
}

object WordSetHits {
  /** Column API: per-list hit counts over a token-array column. */
  def wordSetHits(toks: Column, lists: Seq[Seq[String]]): Column =
    GraftBridge.column(WordSetHits(GraftBridge.expression(toks),
      lists.map(_.toIndexedSeq).toIndexedSeq))
}

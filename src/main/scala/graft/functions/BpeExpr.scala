package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding APPLY: encode each whitespace token against a
  * LEARNED, plan-literal merge list — the real token counter for
  * budget-aware training pipelines (the d06 regex splitter
  * approximates; this IS the tokenizer). Learning happens offline /
  * driver-side ([[Bpe.learnMerges]] — BPE training is inherently
  * iterative); applying is embarrassingly parallel, so ENCODE is the
  * operator that must scale, and it ships the merge ranks with the
  * plan exactly like the signature expressions ship their salts.
  *
  * Algorithm (Sennrich et al. 2016, the published subword-nmt
  * procedure): a word starts as its character sequence; repeatedly
  * find the LOWEST-RANK adjacent symbol pair present in the merge
  * table and fuse every non-overlapping left-to-right occurrence;
  * stop when no pair is ranked. Per-word results are memoized per
  * partition (Zipf: the hot words dominate) via a bounded cache.
  *
  * Codegen note: the per-row body is a single static helper call —
  * the expression stays inside the whole-stage span (no fallback to
  * interpreted projections) while the merge loop lives in plain
  * Scala; the rank map + cache ride as a plan reference object.
  */
// merges is a Seq, NOT an Array: Array equality/hashCode are
// referential, so an Array-carrying case class never compares equal
// to a semantically identical instance — semanticEquals, common-
// subexpression elimination and exchange reuse would silently fail
// (the CentroidArgmax convention).
case class BpeEncode(child: Expression,
                     merges: IndexedSeq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${other.sql}")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val table: BpeEncode.MergeTable =
    BpeEncode.MergeTable(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encodeTokens(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncode.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"""${ev.value} = ${BpeEncode.getClass.getName.stripSuffix("$")}
        .encodeTokens($arr, $tableRef);""")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

object BpeEncode {

  /** Merge ranks + a bounded per-executor memo cache (word → encoded
    * symbols). One instance per plan reference; thread-safe via
    * ConcurrentHashMap, capped so a high-cardinality vocab can't
    * balloon executor memory. */
  final case class MergeTable(merges: IndexedSeq[(String, String)]) {
    @transient lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + "\u0000" + b, i)
      }
      m
    }
    @transient lazy val cache:
        java.util.concurrent.ConcurrentHashMap[String, Array[String]] =
      new java.util.concurrent.ConcurrentHashMap()
    val cacheCap = 65536
  }

  /** Encode one word (character symbols + ranked merges to fixpoint). */
  def encodeWord(word: String, t: MergeTable): Array[String] = {
    val cached = t.cache.get(word)
    if (cached != null) return cached
    var syms: Array[String] =
      word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      // lowest-rank pair present anywhere in the word
      var bestRank = Int.MaxValue
      var bestKey: String = null
      var i = 0
      while (i < syms.length - 1) {
        val k = syms(i) + "\u0000" + syms(i + 1)
        val r = t.rank.get(k)
        if (r != null && r < bestRank) { bestRank = r; bestKey = k }
        i += 1
      }
      if (bestKey == null) done = true
      else {
        // fuse every non-overlapping occurrence, left to right
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              (syms(j) + "\u0000" + syms(j + 1)) == bestKey) {
            out += syms(j) + syms(j + 1)
            j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    if (t.cache.size < t.cacheCap) t.cache.put(word, syms)
    syms
  }

  /** Encode a token array: per-token BPE, concatenated. Called from
    * both interpreted eval and generated code. */
  def encodeTokens(tokens: ArrayData, t: MergeTable): ArrayData = {
    val n = tokens.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).toString
        val enc = encodeWord(w, t)
        var j = 0
        while (j < enc.length) {
          out += UTF8String.fromString(enc(j)); j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Column API. */
  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(
      BpeEncode(GraftBridge.expression(tokens), merges.toIndexedSeq))
}

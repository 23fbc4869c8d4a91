package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash64 as a native Catalyst expression with whole-stage codegen.
  *
  * Input: array<long> of per-token hashes; output: the 64-bit SimHash
  * (majority vote per bit, tie → 0). Exists because the composed-
  * builtin formulation ([[Text.simhash64]]) costs 64 Catalyst ops +
  * one 64-slot array allocation per token; this is one generated Java
  * loop with a stack int[64] per row — the per-row cost that dominates
  * a 100 TB signature pass.
  *
  * Semantics match [[Text.simhash64]] bit-for-bit (spec-tested).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
      int[] $counts = new int[64];
      for (int $i = 0; $i < $arr.numElements(); $i++) {
        long $h = $arr.getLong($i);
        for (int $b = 0; $b < 64; $b++) {
          if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
        }
      }
      long $sig = 0L;
      for (int $b = 0; $b < 64; $b++) {
        if ($counts[$b] > 0) $sig |= (1L << $b);
      }
      ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHashExpr {
  /** Column API: simhash over a pre-hashed array<long> column. */
  def simhash64FromHashes(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))
}

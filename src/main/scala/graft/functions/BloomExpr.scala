package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership count over a string array, as a native
  * codegen expression.
  *
  * The scale path for benchmark decontamination (d14's documented
  * limit): a holdout's shingle set fits a plan-literal exact set up to
  * ~10⁵ strings; past that, the exact strings can't ride the plan but
  * a bloom BITSET can (10 bits/item ⇒ a 10M-shingle holdout is a
  * 12 MB long[], shipped once per executor like a broadcast). The
  * probe runs inside the scan's generated loop — no explode, no join,
  * no shuffle — and has NO FALSE NEGATIVES, so
  * `bloom_count == 0 ⇒ exact overlap == 0`: the expensive exact
  * verification (join or plan-literal set) only ever runs on the
  * bloom-positive sliver. [[graft.dedup.Dedup.decontaminateBloom]]
  * wires the two phases; its output is bit-identical to the exact
  * path (oracle-verified, d22), because false POSITIVES only send a
  * few extra rows to verification, never into the output.
  *
  * Standard double hashing (Kirsch-Mitzenmacher): probe j uses
  * h1 + j·h2 over two XXH64 seeds of the element's UTF-8 bytes.
  */
case class BloomOverlapCount(child: Expression, bits: Array[Long],
                             numHash: Int) extends UnaryExpression {
  require(bits.nonEmpty && numHash >= 1, "bloom: bits + numHash >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.sql}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bloom_overlap"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = bits.length.toLong * 64L
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null &&
        BloomOverlapCount.mightContain(bits, m, numHash, s)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val cls = BloomOverlapCount.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    nullSafeCodeGen(ctx, ev, arr => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      s"""
      int $c = 0;
      long $m = (long) $bitsRef.length * 64L;
      for (int $i = 0; $i < $arr.numElements(); $i++) {
        org.apache.spark.unsafe.types.UTF8String $s =
          $arr.getUTF8String($i);
        if ($s != null &&
            $cls.mightContain($bitsRef, $m, $numHash, $s)) $c++;
      }
      ${ev.value} = $c;
      """
    })
  }

  override protected def withNewChildInternal(
      c: Expression): BloomOverlapCount = copy(child = c)
}

object BloomOverlapCount {

  // two fixed probe seeds (any distinct constants work; stability
  // matters only within one build+probe pair, both of which hash
  // through here)
  private final val Seed1 = 0x9E3779B97F4A7C15L
  private final val Seed2 = 0xC2B2AE3D27D4EB4FL

  /** Shared by build (driver), interpreted eval and generated code —
    * one definition, so build/probe hashing can never diverge. */
  def mightContain(bits: Array[Long], m: Long, numHash: Int,
                   s: UTF8String): Boolean = {
    val h1 = XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
    val h2 = XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
    var j = 0
    while (j < numHash) {
      val idx = ((h1 + j.toLong * h2) & Long.MaxValue) % m
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L).toInt)) == 0L)
        return false
      j += 1
    }
    true
  }

  private def setBit(bits: Array[Long], idx: Long): Unit =
    bits((idx >>> 6).toInt) |= (1L << (idx & 63L).toInt)

  /** Build the bitset on the driver from the holdout's member set.
    * `bitsPerItem = 10` with `numHash = 5` ≈ 1% false-positive rate —
    * only verification work, never output error. */
  def build(items: Iterable[String], bitsPerItem: Int = 10,
            numHash: Int = 5): Array[Long] = {
    val nItems = math.max(items.size, 1)
    val words = math.max(1,
      (nItems.toLong * bitsPerItem + 63L) / 64L).toInt
    val bits = new Array[Long](words)
    val m = words.toLong * 64L
    items.foreach { it =>
      val s = UTF8String.fromString(it)
      val h1 = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
      val h2 = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
      var j = 0
      while (j < numHash) {
        setBit(bits, ((h1 + j.toLong * h2) & Long.MaxValue) % m)
        j += 1
      }
    }
    bits
  }

  /** Column API: how many elements of `arr` the bloom filter reports
    * as possible members of the set `bits` was built from. */
  def bloomOverlap(arr: Column, bits: Array[Long],
                   numHash: Int = 5): Column =
    GraftBridge.column(
      BloomOverlapCount(GraftBridge.expression(arr), bits, numHash))
}

package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL surface for the engine's native codegen expressions
  * (SparkSessionExtensions — the public plugin point, no Spark
  * internals modified):
  *
  *   - `graft_minhash_sig(hashes, k[, seed])` → array<bigint>
  *   - `graft_simhash64(hashes)`              → bigint
  *   - `graft_normalize(str[, form])`         → string (NFC default)
  *
  * Registered either at session build time
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) or onto a
  * live session via [[GraftExtensions.register]]. The remaining
  * native expressions (HyperplaneSig / CentroidArgmax /
  * AnchorOverlap) carry plan-literal matrices that have no natural
  * SQL literal syntax — they stay DataFrame-API-only by design. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // custom whole-operator tier: AS-OF JOIN planner strategy
    // (logical plan → merge-join exec, graft.plans.AsOfJoin) + the
    // optimizer rule that un-bars filter pushdown through it
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      // bigint literals are fine iff they fit — silently wrapping
      // 4294967297 to 1 would hand back a wrong-width signature
      case Literal(v: Long, LongType) if v.isValidInt => v.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be an int-range integer literal, got ${e.sql}")
    }

  private def longLit(e: Expression, fn: String, arg: String): Long =
    e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got ${e.sql}")
    }

  private def strLit(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _: org.apache.spark.sql.types.StringType) =>
        v.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got ${e.sql}")
    }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeText].getName,
        "graft_normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => NormalizeText(s, java.text.Normalizer.Form.NFC)
        case Seq(s, f) => NormalizeText(s,
          java.text.Normalizer.Form.valueOf(
            strLit(f, "graft_normalize", "form")
              .toUpperCase(java.util.Locale.ROOT)))
        case _ => throw new IllegalArgumentException(
          "graft_normalize(str[, 'NFC'|'NFD'|'NFKC'|'NFKD'])")
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName,
        "graft_minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(h, k) =>
          MinHashSig(h, intLit(k, "graft_minhash_sig", "k"), 42L)
        case Seq(h, k, s) =>
          MinHashSig(h, intLit(k, "graft_minhash_sig", "k"),
            longLit(s, "graft_minhash_sig", "seed"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_sig(hashes, k[, seed])")
      }),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(h) => SimHash64(h)
        case _ => throw new IllegalArgumentException(
          "graft_simhash64(hashes)")
      }))

  /** Register onto a live session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    val reg: FunctionRegistry =
      org.apache.spark.sql.graftbridge.GraftBridge.functionRegistry(spark)
    all.foreach { case (ident, info, builder) =>
      reg.registerFunction(ident, info, builder)
    }
  }
}

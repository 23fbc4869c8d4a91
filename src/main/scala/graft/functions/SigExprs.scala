package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** MinHash signature as one native codegen loop.
  *
  * Input: array<long> of per-shingle hashes; output: array<long> of k
  * salted minima — bit-for-bit the same signature as the composed
  * [[Text.minhashSigFromHashes]] (spec-tested), which evaluates
  * k separate `array_min(transform(hashes, xxhash64(_, salt)))` passes:
  * k ArrayData traversals + k array allocations per row, and Catalyst
  * cannot CSE the per-element inner hash across the salt branches.
  * Here: ONE pass, the inner `XXH64(h, 42)` hoisted per element, k
  * register-resident compares — the per-row cost that dominates a
  * 100 TB signature scan.
  *
  * Bit-parity: Spark's `xxhash64(h, salt)` folds left over its args
  * starting from seed 42, i.e. `hashLong(salt, hashLong(h, 42))` —
  * reproduced exactly below. Empty input → all Long.MaxValue (the
  * composed version's coalesce fallback).
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  // same salt derivation as Text.minhashSigFromHashes — keeps the two
  // formulations interchangeable
  private lazy val salts: Array[Long] = {
    val rng = new scala.util.Random(seed)
    Array.fill(k)(rng.nextLong())
  }

  private val XxSeed = 42L  // functions.xxhash64's fixed seed

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val inner = XXH64.hashLong(arr.getLong(i), XxSeed)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(salts(j), inner)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val saltsRef = ctx.addReferenceObj("salts", salts, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inner = ctx.freshName("inner")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
      long[] $mins = new long[$k];
      java.util.Arrays.fill($mins, Long.MAX_VALUE);
      for (int $i = 0; $i < $arr.numElements(); $i++) {
        long $inner = $xxh.hashLong($arr.getLong($i), ${XxSeed}L);
        for (int $j = 0; $j < $k; $j++) {
          long $v = $xxh.hashLong($saltsRef[$j], $inner);
          if ($v < $mins[$j]) $mins[$j] = $v;
        }
      }
      ${ev.value} = org.apache.spark.sql.catalyst.expressions
        .UnsafeArrayData.fromPrimitiveArray($mins);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Random-hyperplane bit signature as one native codegen loop.
  *
  * Input: array<float> embedding; output: 64-bit signature with
  * bit i = sign(v · plane_i) — bit-for-bit the composed
  * [[Vectors.hyperplaneSig]] (spec-tested), which evaluates `bits`
  * separate `aggregate(zip_with(...))` dot products: 64 traversals of
  * the vector with per-element Double boxing. Here the plane matrix is
  * a plan-carried double[][] and the row cost is one bits×dim loop
  * nest over primitive floats.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  // Parity note: the composed formulation's zip_with pads the SHORTER
  // side with nulls on any length mismatch, null-poisoning every
  // projection → sig 0. Reproduce that: a ragged vector gets sig 0,
  // never a partial dot product.
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    if (planes.nonEmpty && n == planes(0).length) {
      var i = 0
      while (i < planes.length) {
        val p = planes(i)
        var proj = 0.0
        var j = 0
        while (j < n) {
          proj += arr.getFloat(j).toDouble * p(j)
          j += 1
        }
        if (proj > 0) sig |= (1L << i)
        i += 1
      }
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val proj = ctx.freshName("proj")
      s"""
      long $sig = 0L;
      if ($planesRef.length > 0 &&
          $arr.numElements() == $planesRef[0].length) {
        for (int $i = 0; $i < $planesRef.length; $i++) {
          double[] $p = $planesRef[$i];
          double $proj = 0.0;
          for (int $j = 0; $j < $arr.numElements(); $j++) {
            $proj += ((double) $arr.getFloat($j)) * $p[$j];
          }
          if ($proj > 0) $sig |= (1L << $i);
        }
      }
      ${ev.value} = $sig;
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)
}

/** Exact set overlap of an array<string> column against a FIXED
  * anchor set, as one native pass: struct(n_inter, n_union) over the
  * DISTINCT elements of each side.
  *
  * Matches `array_intersect`/`array_union` sizes of the distinct
  * arrays exactly, but where the composed formulation allocates
  * distinct+intersect+union arrays per row (and array_intersect
  * rebuilds the anchor-side hash set per row), the anchor set here is
  * prebuilt once and carried with the plan, and each row is ONE
  * traversal: union = |distinct(a)| + |anchor| − hits. Null elements
  * are ignored (shingle arrays never contain them). Returning counts
  * (not the ratio) keeps oracle comparisons in exact integers.
  */
case class AnchorOverlap(child: Expression,
                         anchor: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.sql}")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_inter",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_union",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "graft_anchor_overlap"

  // distinct anchor as UTF8String hash set, built once per plan
  @transient private lazy val anchorSet
      : java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[
      org.apache.spark.unsafe.types.UTF8String]()
    anchor.foreach(a => s.add(
      org.apache.spark.unsafe.types.UTF8String.fromString(a)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val seen = new java.util.HashSet[
      org.apache.spark.unsafe.types.UTF8String]()
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (seen.add(s) && anchorSet.contains(s)) hits += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hits, seen.size + anchorSet.size - hits))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val anchorRef =
      ctx.addReferenceObj("anchorSet", anchorSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, arr => {
      val seen = ctx.freshName("seen")
      val hits = ctx.freshName("hits")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
      java.util.HashSet $seen = new java.util.HashSet();
      int $hits = 0;
      for (int $i = 0; $i < $arr.numElements(); $i++) {
        if (!$arr.isNullAt($i)) {
          org.apache.spark.unsafe.types.UTF8String $s =
            $arr.getUTF8String($i);
          if ($seen.add($s) && $anchorRef.contains($s)) $hits++;
        }
      }
      ${ev.value} =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{$hits, $seen.size() + $anchorRef.size() - $hits});
      """
    })
  }

  override protected def withNewChildInternal(c: Expression)
      : AnchorOverlap = copy(child = c)
}

/** IVF centroid assignment — argmax-cosine over a plan-carried
  * centroid matrix, one native pass.
  *
  * Matches [[Vectors.ivfAssign]]'s composed
  * `greatest(struct(cosine, cid)…)` exactly for well-formed input:
  * per centroid, cosine = dot/(‖v‖·‖c‖) with the same left-to-right
  * double accumulation (and 0.0 when either norm is 0), ties broken
  * toward the LARGER cid (greatest over (sim, cid) structs is
  * lexicographic). The composed form re-traverses the vector
  * 3×nCentroids times per row (dot + norm per centroid via separate
  * aggregate/zip_with); here ‖v‖ is computed once and each centroid
  * costs one fused dot loop, with centroid norms precomputed at plan
  * build. Ragged vectors (length ≠ dim) score 0.0 against every
  * centroid (documented; embeddings are fixed-dim).
  */
case class CentroidArgmax(child: Expression,
                          cents: Array[Array[Double]],
                          cids: Array[Int])
    extends UnaryExpression {
  require(cents.length == cids.length && cents.nonEmpty,
    "centroids and ids must align and be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.sql}")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_centroid_argmax"

  @transient private lazy val cNorms: Array[Double] =
    cents.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var vv = 0.0
    var j = 0
    while (j < n) {
      val x = arr.getFloat(j).toDouble; vv += x * x; j += 1
    }
    val nv = math.sqrt(vv)
    var bestSim = Double.NegativeInfinity
    var bestCid = Int.MinValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val sim =
        if (n != c.length) 0.0
        else {
          var dot = 0.0; var k = 0
          while (k < n) { dot += arr.getFloat(k).toDouble * c(k); k += 1 }
          val d = nv * cNorms(i)
          if (d == 0) 0.0 else dot / d
        }
      if (sim > bestSim || (sim == bestSim && cids(i) > bestCid)) {
        bestSim = sim; bestCid = cids(i)
      }
      i += 1
    }
    java.lang.Integer.valueOf(bestCid)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("cnorms", cNorms, "double[]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val vv = ctx.freshName("vv")
      val nv = ctx.freshName("nv")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val sim = ctx.freshName("sim")
      s"""
      int $n = $arr.numElements();
      double $vv = 0.0;
      for (int $j = 0; $j < $n; $j++) {
        double $x = (double) $arr.getFloat($j); $vv += $x * $x;
      }
      double $nv = java.lang.Math.sqrt($vv);
      double $best = Double.NEGATIVE_INFINITY;
      int $bestCid = Integer.MIN_VALUE;
      for (int $i = 0; $i < $centsRef.length; $i++) {
        double[] $c = $centsRef[$i];
        double $sim;
        if ($n != $c.length) { $sim = 0.0; }
        else {
          double $dot = 0.0;
          for (int $k = 0; $k < $n; $k++) {
            $dot += ((double) $arr.getFloat($k)) * $c[$k];
          }
          double $d = $nv * $normsRef[$i];
          $sim = ($d == 0) ? 0.0 : $dot / $d;
        }
        if ($sim > $best || ($sim == $best && $cidsRef[$i] > $bestCid)) {
          $best = $sim; $bestCid = $cidsRef[$i];
        }
      }
      ${ev.value} = $bestCid;
      """
    })
  }

  override protected def withNewChildInternal(c: Expression)
      : CentroidArgmax = copy(child = c)
}

/** Native float-vector dot product: Σ (double)a_i · (double)b_i,
  * summed LEFT TO RIGHT — bit-for-bit the fold [[graft.functions.Vectors.dot]]
  * evaluates via `aggregate(zip_with(...))`, so the two forms are
  * interchangeable under the DuckDB oracle (which also folds left).
  * The HOF form allocates a 64-slot intermediate array and walks two
  * generic ArrayData per PAIR; at |Q|·|corpus| pairs that allocation
  * is the dominant cost of brute-force scoring (measured on v14:
  * 4 M pairs, ~2× end-to-end). Here: one fused loop, zero allocation.
  *
  * Parity on the edges: length mismatch → null (zip_with pads with
  * null and the fold poisons), a null ELEMENT on either side → null
  * (same poisoning). */
case class VecDotF(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true  // also null on ragged input
  override def prettyName: String = "graft_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      java.lang.Double.valueOf(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
      if ($x.numElements() != $y.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $s = 0.0;
        for (int $i = 0; $i < $x.numElements(); $i++) {
          if ($x.isNullAt($i) || $y.isNullAt($i)) {
            ${ev.isNull} = true; break;
          }
          $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
        }
        if (!${ev.isNull}) ${ev.value} = $s;
      }
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDotF = copy(left = l, right = r)
}

object SigExprs {

  /** Column API: native float-array dot product (see [[VecDotF]]). */
  def vecDotF(a: Column, b: Column): Column =
    GraftBridge.column(
      VecDotF(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: nearest-centroid id by cosine (IVF assignment). */
  def centroidArgmax(vec: Column,
                     centroids: Seq[(Int, Seq[Float])]): Column =
    GraftBridge.column(CentroidArgmax(
      GraftBridge.expression(vec),
      centroids.map(_._2.map(_.toDouble).toArray).toArray,
      centroids.map(_._1).toArray))

  /** Column API: single-pass (n_inter, n_union) vs a fixed anchor. */
  def anchorOverlap(arr: Column, anchor: Seq[String]): Column =
    GraftBridge.column(
      AnchorOverlap(GraftBridge.expression(arr), anchor.toArray))

  /** Exact Jaccard vs a fixed anchor set, derived from
    * [[anchorOverlap]] (0.0 on empty union — Text.jaccard parity). */
  def jaccardToAnchor(arr: Column, anchor: Seq[String]): Column = {
    val o = anchorOverlap(arr, anchor)
    org.apache.spark.sql.functions.when(
      o.getField("n_union") === 0,
      org.apache.spark.sql.functions.lit(0.0))
      .otherwise(o.getField("n_inter").cast("double") /
        o.getField("n_union"))
  }

  /** Column API: MinHash signature over a pre-hashed array<long>. */
  def minhashSigFromHashes(hashes: Column, k: Int,
                           seed: Long = 42L): Column =
    GraftBridge.column(
      MinHashSig(GraftBridge.expression(hashes), k, seed))

  /** Column API: hyperplane signature over an array<float> vector,
    * planes derived exactly like [[Vectors.hyperplaneSig]]. */
  def hyperplaneSig(vec: Column, dim: Int, bits: Int,
                    seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes =
      Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(vec), planes))
  }
}

package graft.text

import graft.CacheTracker
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — trained AND applied
  * inside the engine. The distributed floor of the fastText-style
  * quality/domain classifiers every large curation pipeline runs
  * (CCNet's lang filter, GPT-3's WebText-vs-CommonCrawl quality
  * model, FineWeb-Edu's educational scorer): training is nothing but
  * counting, so it distributes exactly like an aggregation, and
  * scoring is one vocabulary join — no parameter server, no iterative
  * optimizer, no driver-side data.
  *
  * Model (add-one smoothing; costs are negative log-likelihoods):
  *
  *   cost(t | c)  = ln((N_c + V) / (c(t,c) + 1))
  *   prior(c)     = ln(D / D_c)
  *   pred(d)      = argmin_c prior(c) + Σ_{t ∈ d} cost(t | c)
  *
  * Determinism (the d28/d46 micro-nat contract): every per-token cost
  * and every prior is quantized to integer micro-nats BEFORE any sum,
  * so aggregation is exact integer addition with no float-order
  * dependence; ties in the argmin break to the lexicographically
  * smallest label via a least-struct (never a window).
  *
  * Scale shape at 100 TB: one explode → token-keyed count shuffle
  * builds the (token × class) weight table (Zipf-small vs the corpus);
  * scoring is ONE token-keyed equi-join of the apply set against the
  * class-pivoted weight table, then one doc-keyed integer sum. The
  * class dimension is static (pivot columns), so no |classes|×
  * row blowup ships through the join. Driver-side state is L-bounded
  * model constants only — per-class doc/token totals and the vocab
  * size (the v02 centroid-collect rationale); the 100 TB refinement is
  * broadcasting a top-V vocabulary with an OOV bucket, which makes the
  * scoring join map-side.
  */
object NaiveBayes {

  /** Train on `!isApply` docs, score the `isApply` holdout. Output:
    * one row per holdout doc — `id`, `actual` label, `pred` label,
    * `cost_micro` (winner's total integer micro-nat cost). Docs with
    * zero tokens are still scored (prior-only). */
  def trainApply(docs: DataFrame, textCol: String, idCol: String,
                 labelCol: String, isApply: Column): DataFrame = {
    val base = CacheTracker.persistTracked(
      docs.select(col(idCol).as("id"), col(labelCol).as("label"),
        Text.tokens(col(textCol)).as("toks"), isApply.as("__apply")))
    val trainToks = CacheTracker.persistTracked(
      base.filter(!col("__apply"))
        .select(col("label"), explode(col("toks")).as("tok")))

    // L-bounded model constants to the driver (bounded by |classes|,
    // the v02 centroids rationale — never row data).
    val classDocs = base.filter(!col("__apply")).groupBy("label")
      .agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val nTok = trainToks.groupBy("label")
      .agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vocab = trainToks.select("tok").distinct().count()
    val dTotal = classDocs.map(_._2).sum
    val classes = classDocs.map(_._1)
    // an all-apply input has nothing to train on — fail loudly here
    // instead of letting least() die later with an opaque zero-child
    // analysis error
    require(classes.nonEmpty, "NaiveBayes.trainApply: empty training " +
      "partition (every row matches isApply) — nothing to train on")

    // (token × class) counts, pivoted to one static column per class:
    // the scoring join is on `tok` alone. Internal columns are
    // INDEX-based (__c_0, __c_1, ...) — labels are data and may
    // contain backticks or any other character a column name can't;
    // pivot emits columns in the order of the `classes` seq, so the
    // positional rename is exact.
    val weights = trainToks.groupBy("tok", "label")
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy("tok").pivot("label", classes).agg(first("c"))
      .toDF("tok" +: classes.indices.map(i => s"__c_$i"): _*)

    val applyDocs = base.filter(col("__apply"))
      .select(col("id"), col("label").as("actual"))
    val sumCols = classes.zipWithIndex.map { case (c, i) =>
      sum(round(lit(1e6) *
        log(lit((nTok.getOrElse(c, 0L) + vocab).toDouble) /
          (coalesce(col(s"__c_$i"), lit(0L)) + lit(1L)).cast("double")))
        .cast("long")).cast("long").as(s"__s_$i")
    }
    val sums = base.filter(col("__apply"))
      .select(col("id"), explode(col("toks")).as("tok"))
      .join(weights, Seq("tok"), "left")
      .groupBy("id")
      .agg(sumCols.head, sumCols.tail: _*)

    val priors = classDocs.toMap
    val totals = applyDocs.join(sums, Seq("id"), "left")
    val totalCols = classes.zipWithIndex.map { case (c, i) =>
      (lit(math.round(1e6 *
        math.log(dTotal.toDouble / priors(c).toDouble))) +
        coalesce(col(s"__s_$i"), lit(0L))).as(s"__t_$i")
    }
    val structs = classes.zipWithIndex.map { case (c, i) =>
      struct(col(s"__t_$i").as("cost"), lit(c).as("label")) }
    // least() needs >= 2 children — a one-class model is degenerate
    // but legal (everything gets the single label)
    val best =
      if (structs.size == 1) structs.head else least(structs: _*)
    totals.select(col("id") +: col("actual") +: totalCols: _*)
      .withColumn("__best", best)
      .select(col("id"), col("actual"),
        col("__best").getField("label").as("pred"),
        col("__best").getField("cost").as("cost_micro"))
  }
}

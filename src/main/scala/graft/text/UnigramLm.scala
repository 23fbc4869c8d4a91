package graft.text

import graft.CacheTracker
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM surprisal scoring — the CCNet/C4-style corpus-level
  * quality signal (Wenzek et al. 2020 score documents by LM
  * perplexity; the unigram model is its distributed-friendly floor).
  * Each document gets the total and mean negative log-likelihood of
  * its tokens under the corpus's own unigram distribution: boilerplate
  * made of ultra-common tokens scores low, rare-token-dense noise
  * scores high, and both tails are what a curation pass inspects.
  *
  *   cost(t) = ln(N / cf(t))      nll(d) = Σ_{t ∈ d} cost(t)
  *
  * Determinism: the per-token cost is quantized to INTEGER micro-nats
  * (round(1e6·ln)) BEFORE the per-doc sum, so the aggregate is exact
  * integer addition — no float-sum-order dependence anywhere (the
  * mean is derived from the two exact integers afterwards). The only
  * cross-engine float surface is ln() itself (≤1-ulp libm gap ≈ 2e-10
  * in the quantized value, flips only a cost sitting ~1e-10 from a
  * .5 boundary — measured margin on the gate corpora is ≥0.02).
  *
  * Shape at 100 TB: explode → token-keyed count (map-side combined)
  * → join instances back on the token key → doc-keyed sum. Two
  * equi-shuffles on the token, one on the doc id; the exploded frame
  * is persisted because the count pass and the join pass both read
  * it. The token-count table is Zipf-small relative to the corpus —
  * the scale alternative is broadcasting a top-V vocabulary with an
  * OOV smoothing bucket, which turns the second shuffle into a
  * map-side lookup; kept as the join so the oracle is exact.
  * Zero-token docs have no surprisal and are not emitted. */
object UnigramLm {

  def surprisal(docs: DataFrame, textCol: String,
                idCol: String): DataFrame = {
    val toks = CacheTracker.persistTracked(
      docs.select(col(idCol).as("id"),
        explode(Text.tokens(col(textCol))).as("tok")))
    val cf = toks.groupBy("tok").agg(count(lit(1)).as("cf"))
    val n = cf.agg(sum("cf").cast("long").as("n"))
    toks.join(cf, "tok")
      .crossJoin(broadcast(n))
      .withColumn("__c",
        round(lit(1e6) * log(col("n").cast("double") /
          col("cf").cast("double"))).cast("long"))
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum("__c").cast("long").as("nll_micro"))
      .withColumn("avg_nll",
        col("nll_micro") / lit(1e6) / col("n_tokens"))
      .withColumnRenamed("id", idCol)
  }

  /** Bigram-LM surprisal with add-one smoothing — one Markov order up
    * from [[surprisal]], the distributed floor of the KenLM-perplexity
    * filter CCNet actually runs: documents whose WORD SEQUENCE is
    * improbable (shuffled tokens, keyword stuffing) score high even
    * when every individual token is common — the signal the unigram
    * model is structurally blind to.
    *
    *   cost(w1,w2) = ln((c(w1) + V) / (c(w1,w2) + 1))   [= −ln P̂(w2|w1)]
    *
    * Same determinism contract as [[surprisal]]: per-bigram cost
    * quantized to integer micro-nats before the per-doc sum. Same
    * scale shape + one more token-keyed count (the bigram table);
    * the w1 unigram join reuses the SAME count table the unigram
    * pass built. Docs with <2 tokens have no bigrams → not emitted. */
  def bigramSurprisal(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame = {
    val base = CacheTracker.persistTracked(
      docs.select(col(idCol).as("id"),
        Text.tokens(col(textCol)).as("toks")))
    val bigrams = CacheTracker.persistTracked(
      base.select(col("id"),
        explode(Text.wordShingles(col("toks"), 2)).as("bg")))
    val c12 = bigrams.groupBy("bg").agg(count(lit(1)).as("c12"))
    val c1 = base.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).cast("long").as("v"))
    bigrams.join(c12, "bg")
      .withColumn("__w1", substring_index(col("bg"), " ", 1))
      .join(c1.withColumnRenamed("tok", "__w1"), "__w1")
      .crossJoin(broadcast(v))
      .withColumn("__c",
        round(lit(1e6) * log(
          (col("c1") + col("v")).cast("double") /
            (col("c12") + 1).cast("double"))).cast("long"))
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum("__c").cast("long").as("nll_micro"))
      .withColumn("avg_nll",
        col("nll_micro") / lit(1e6) / col("n_bigrams"))
      .withColumnRenamed("id", idCol)
  }

  /** Interpolated Kneser–Ney bigram surprisal (Kneser & Ney 1995;
    * Chen & Goodman 1999 eq. 4.25) — the smoothing the real KenLM
    * filter uses, one step past [[bigramSurprisal]]'s add-one:
    *
    *   P(w2|w1) = max(c(w1w2)−D, 0)/c(w1·)
    *            + (D·N₁₊(w1·)/c(w1·)) · (N₁₊(·w2)/T)
    *
    * with discount D, c(w1·) = Σ_w2 c(w1w2), N₁₊(w1·)/N₁₊(·w2) the
    * distinct-continuation counts, and T the number of distinct
    * bigram TYPES. The continuation term is KN's insight: "Francisco"
    * is frequent but follows only "San", so its unigram backoff mass
    * is tiny — exactly what add-one smoothing gets wrong.
    *
    * Same determinism contract as [[surprisal]] (integer micro-nat
    * quantization before the doc sum; the P expression is one fixed
    * association order replayed verbatim in the oracle). Scoring the
    * training corpus itself means every scored bigram has c ≥ 1, so
    * P > 0 with no OOV branch.
    *
    * Shape at 100 TB: the model tables are token-keyed counts with
    * map-side combine (c12 from the bigram shuffle; c1/N₁₊ both fold
    * from c12, Zipf-small). The cost is computed per bigram TYPE —
    * the c1/bw/t joins and the log run over the Zipf-small type
    * table, NOT per instance — so the instance side pays exactly ONE
    * bg-keyed equi-join against the scored model and a doc-keyed
    * sum. The c12 table is persisted — four downstream consumers.
    * Docs with <2 tokens → not emitted.
    * (sf0.1 steady-state 2.1 s — identical to add-one
    * [[bigramSurprisal]]: the shared bigram explode + type shuffle
    * is the floor, the KN extras ride the Zipf-small type table.) */
  def knBigramSurprisal(docs: DataFrame, textCol: String,
                        idCol: String,
                        discount: Double = 0.75): DataFrame = {
    // unlike bigramSurprisal, nothing else reads the tokenized base
    // (c1/N₁₊ fold from the c12 TYPE table) — don't persist it
    val base = docs.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("toks"))
    val bigrams = CacheTracker.persistTracked(
      base.select(col("id"),
        explode(Text.wordShingles(col("toks"), 2)).as("bg")))
    val c12 = CacheTracker.persistTracked(
      bigrams.groupBy("bg").agg(count(lit(1)).as("c12"))
        .withColumn("__w1", substring_index(col("bg"), " ", 1))
        .withColumn("__w2", substring_index(col("bg"), " ", -1)))
    // c(w1·) and N₁₊(w1·) fold from the TYPE table in one pass
    val c1 = c12.groupBy("__w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1fw"))
    val bw = c12.groupBy("__w2").agg(count(lit(1)).as("n1bw"))
    val t = c12.agg(count(lit(1)).cast("long").as("t"))
    val d = lit(discount)
    // per-TYPE cost: every join below is type-table-sized, and -log
    // runs once per distinct bigram, not once per occurrence
    val model = c12.select("bg", "c12", "__w1", "__w2")
      .join(c1, "__w1").join(bw, "__w2")
      .crossJoin(broadcast(t))
      .withColumn("__p",
        (greatest(col("c12").cast("double") - d, lit(0.0)) /
          col("c1").cast("double")) +
          ((d * col("n1fw").cast("double") / col("c1").cast("double")) *
            (col("n1bw").cast("double") / col("t").cast("double"))))
      .withColumn("__c",
        round(lit(1e6) * -log(col("__p"))).cast("long"))
      .select("bg", "__c")
    bigrams.join(model, "bg")
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum("__c").cast("long").as("nll_micro"))
      .withColumn("avg_nll",
        col("nll_micro") / lit(1e6) / col("n_bigrams"))
      .withColumnRenamed("id", idCol)
  }
}

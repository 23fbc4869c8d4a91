package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement over a distributed table —
  * the Efraimidis–Spirakis (A-ES) one-pass scheme: draw
  * u_i ∈ (0, 1] per row, give each row the key u_i^(1/w_i), keep the
  * k largest keys. Inclusion probability is proportional to weight
  * and the sample size is EXACTLY k — the fixed-budget training-mix
  * draw that a per-row Bernoulli thinning (catalog d23) cannot
  * provide.
  *
  * Scale shape: the key is pure per-row codegen (md5 draw + one ln);
  * `orderBy(key desc).limit(k)` compiles to TakeOrderedAndProject —
  * per-partition k-heaps, a single k·partitions-row collect, no
  * global sort and no shuffle of the table. ln is monotone so
  * ordering by ln(u)/w orders by u^(1/w) without ever computing the
  * root; the key never leaves the plan.
  *
  * Determinism: u is the portable 60-bit md5 draw
  * ([[Text.portableTokenHash]]) over `seedTag # id`, shifted by +1 so
  * u > 0 (ln-safe) — layout-independent, reproducible in SQL, so a
  * DuckDB oracle replays the identical selection (catalog d40).
  */
object Sampling {

  /** Keep the `k` rows of `df` with the largest u^(1/weight), weight
    * from `weightCol` (rows with weight <= 0 are excluded — they have
    * zero inclusion probability in A-ES). `idCol` seeds the draw and
    * breaks key ties. Output: the selected rows, original columns. */
  def weightedTopK(df: DataFrame, weightCol: Column, idCol: Column,
                   k: Int, seedTag: String): DataFrame = {
    val u = (Text.portableTokenHash(
        concat(lit(seedTag + "#"), idCol.cast("string")))
      .cast("double") + 1.0d) / lit(math.pow(2, 60))
    df.filter(weightCol > 0)
      .withColumn("__es_key", log(u) / weightCol)
      .orderBy(col("__es_key").desc, idCol.asc)
      .limit(k)
      .drop("__es_key")
  }
}

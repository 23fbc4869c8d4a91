package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the fact rows
  * (a viral post's votes, a bot account's events), a plain shuffle
  * join puts that key's entire row set in ONE reducer partition — the
  * straggler that defines the stage's wall-clock at 100 TB. Salting
  * splits each key's fact rows across `salts` partitions by extending
  * the join key with a deterministic per-row salt, and replicates the
  * (small) dimension side once per salt value so every fact row still
  * meets its dimension row exactly once.
  *
  * This is the MANUAL form of what AQE skew-join does adaptively
  * (splitting oversized partitions at runtime). It exists for the
  * cases AQE can't reach: skew landing in a single key (AQE splits
  * partitions, not keys), deterministic pre-planned layouts, and
  * non-broadcastable-but-small dimension sides. Result is provably
  * identical to the unsalted inner join (oracle-verified by q24).
  */
object SkewJoin {

  /** Inner-join `facts` with `dim` on `factKey === dimKey`, spreading
    * each key over `salts` shuffle partitions.
    *
    * `saltSource` must be a deterministic per-row column of `facts`
    * (e.g. a unique id) — the salt is `pmod(xxhash64(saltSource),
    * salts)`, so replays and retries land identically. The dimension
    * side is exploded ×`salts` (size·salts rows — sized for dimension
    * tables, not for fact-fact joins; for those, split only the known
    * hot keys and union with an unsalted join of the rest). */
  def saltedEquiJoin(facts: DataFrame, dim: DataFrame,
                     factKey: Column, dimKey: Column,
                     saltSource: Column, salts: Int): DataFrame = {
    require(salts >= 1, "salts >= 1")
    val salted = facts.withColumn("__fsalt",
      pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val dimX = dim.withColumn("__dsalt",
      explode(array((0 until salts).map(lit): _*)))
    salted
      .join(dimX, factKey === dimKey && col("__fsalt") === col("__dsalt"))
      .drop("__fsalt", "__dsalt")
  }
}

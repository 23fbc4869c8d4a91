package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the row-level change set between two versions of a
  * keyed table (`added` / `removed` / `changed`), the companion read
  * to the SCD2 history operator (q30): SCD2 stores every version,
  * diff answers "what changed between these two snapshots" without a
  * history table.
  *
  * Shape: each side is projected down to (key, fingerprint) BEFORE
  * the join — the full-outer join shuffles two key+32-byte columns,
  * never row payloads, and unchanged rows (the overwhelming majority
  * between adjacent snapshots) are filtered in the same stage. With
  * both snapshots bucketed by the key (the posts-table layout,
  * `state.Layout`) the join is exchange-free.
  *
  * Fingerprints are md5 over \u0001-joined column values with a
  * `\u0002` null sentinel (DuckDB `chr(2)`) — the separator keeps
  * ("ab","c") distinct from
  * ("a","bc"), and the construction is engine-portable: the q33
  * oracle rebuilds the identical fingerprint in DuckDB as
  * `md5(a || chr(1) || b)`. Callers quantize
  * doubles into the compare columns first (cents, micro-units) the
  * same way the other hash-verified rows do.
  */
object Diff {

  /** Portable row fingerprint over `cols` (pre-stringified columns). */
  def rowFingerprint(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*))

  /** Change set `new` vs `old` keyed by `keys`, comparing
    * `compareCols` (name → pre-quantized expression). Output: keys,
    * `change` ∈ added|removed|changed, `old_fp`, `new_fp` (null on
    * the absent side). Unchanged rows are dropped. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String],
                   compareCols: Seq[Column]): DataFrame = {
    def slim(df: DataFrame, fpName: String) =
      df.select(keys.map(col) :+ rowFingerprint(compareCols).as(fpName): _*)
    val o = slim(oldDf, "old_fp")
    val n = slim(newDf, "new_fp")
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change") :+ col("old_fp") :+
        col("new_fp"): _*)
  }
}

package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (a Deequ-style check pass):
  * the table-health report a pipeline runs BEFORE trusting a batch —
  * null counts, domain violations, range violations, key duplication
  * — computed in ONE aggregate scan.
  *
  * Shape at 100 TB: every check is a `sum(when(violation, 1))` over
  * the same scan, so the whole report is a single map-side-combined
  * hash aggregate producing one row — no joins, no second pass, no
  * per-check scans. Key-uniqueness rides the same aggregate as
  * `count - count_distinct` (distinct-count is the one partial that
  * shuffles more than a scalar; swap in approx_count_distinct when an
  * exact duplicate count isn't required). All outputs are exact
  * integers — the catalog row (d36) hash-matches a DuckDB oracle.
  */
object Expectations {

  /** One violation counter: `name` → predicate that flags a BAD row.
    * Null predicate results count as violations when `nullIsBad`
    * (the common case: a null in a checked column is itself a
    * finding). */
  final case class Check(name: String, bad: Column,
                         nullIsBad: Boolean = true) {
    private[quality] def counter: Column = {
      val flagged =
        if (nullIsBad) coalesce(bad, lit(true)) else bad <=> lit(true)
      sum(when(flagged, 1L).otherwise(0L)).as(name)
    }
  }

  /** The report: one row — `n_rows`, one violation count per check,
    * and per uniqueness key `dup_<col>` = NON-NULL rows minus
    * distinct values (count(col) ignores nulls exactly like
    * count(DISTINCT col) does, so null keys can't masquerade as
    * duplicates) plus `nullkey_<col>` = null-key rows, a finding of
    * its own. */
  def report(df: DataFrame, checks: Seq[Check],
             uniqueKeys: Seq[String] = Nil): DataFrame = {
    val aggs = checks.map(_.counter) ++ uniqueKeys.flatMap(k => Seq(
      (count(col(k)) - countDistinct(col(k))).as(s"dup_$k"),
      (count(lit(1)) - count(col(k))).as(s"nullkey_$k")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}

package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's predicate algebra.
  *
  * Re-expresses the reference's GraphQL→filter compiler
  * (`TransformArgToMongodb`, src/modules/api/graphql-v2/resolvers/index.ts:7-20
  * and the `WhereField` input type, schema.ts:257-268) as Catalyst
  * `Column` expressions, so the optimizer can push every predicate into
  * the parquet scan.
  *
  * Semantics preserved from the reference:
  *   - all present ops on one field AND together;
  *   - an empty `_in` list is skipped entirely (resolvers/index.ts:14-16),
  *     i.e. it does NOT mean "match nothing";
  *   - `_eq` on an array-typed field means membership (Mongo multikey).
  */
final case class Where(
    eq: Option[Any] = None,
    ne: Option[Any] = None,
    lt: Option[Any] = None,
    gt: Option[Any] = None,
    lte: Option[Any] = None,
    gte: Option[Any] = None,
    in: Option[Seq[Any]] = None,
    nin: Option[Seq[Any]] = None,
    regex: Option[String] = None) {

  /** Compile against a scalar column. Returns None when no op is set
    * (reference: absent filter = no constraint). */
  def compile(c: Column): Option[Column] = {
    val parts = Seq(
      eq.map(v => c === lit(v)),
      ne.map(v => c =!= lit(v)),
      lt.map(v => c < lit(v)),
      gt.map(v => c > lit(v)),
      lte.map(v => c <= lit(v)),
      gte.map(v => c >= lit(v)),
      in.filter(_.nonEmpty).map(vs => c.isin(vs: _*)),
      nin.filter(_.nonEmpty).map(vs => !c.isin(vs: _*)),
      regex.map(r => c.rlike(r))
    ).flatten
    parts.reduceOption(_ && _)
  }

  /** Compile against an array column: `_eq`/`_in` are membership tests,
    * `_regex` matches if any element matches (Mongo multikey semantics). */
  def compileArray(c: Column): Option[Column] = {
    val parts = Seq(
      eq.map(v => array_contains(c, v)),
      ne.map(v => !array_contains(c, v)),
      in.filter(_.nonEmpty)
        .map(vs => arrays_overlap(c, array(vs.map(lit): _*))),
      nin.filter(_.nonEmpty)
        .map(vs => !arrays_overlap(c, array(vs.map(lit): _*))),
      regex.map(r => exists(c, e => e.rlike(r)))
    ).flatten
    parts.reduceOption(_ && _)
  }
}

object Predicates {
  /** AND-fold a set of optional predicates; None ⇒ `true` (scan all). */
  def all(preds: Option[Column]*): Column =
    preds.flatten.reduceOption(_ && _).getOrElse(lit(true))

  /** OR-fold — the reference's `_or` feed filter (resolvers/index.ts:108-116). */
  def any(preds: Option[Column]*): Column =
    preds.flatten.reduceOption(_ || _).getOrElse(lit(true))

  /** Evaluate expensive computed columns EXACTLY once per row even
    * when a filter above consumes them.
    *
    * Predicate pushdown substitutes a projected alias into the
    * pushed filter, so `project(q).filter(p(q))` evaluates q's whole
    * expression dag twice per row (measured 2× on the d23 quality
    * sampler — see BENCH_NOTES). An explode-of-one is a Generate the
    * optimizer cannot push an OUTPUT-referencing predicate below, so
    * the struct is computed once and both the filter and the final
    * projection read the materialized field.
    *
    * Keeps `keep` columns alongside the computed `fields` (exposed
    * under their given names). Use only when the computed work is
    * genuinely expensive — the Generate costs a row-copy. */
  def evalOnce(df: org.apache.spark.sql.DataFrame,
               keep: Seq[Column], fields: (String, Column)*)
      : org.apache.spark.sql.DataFrame = {
    val m = struct(fields.map { case (n, c) => c.as(n) }: _*)
    val projected = df.select(keep :+ explode(array(m)).as("__m"): _*)
    // the second select references keep columns BY OUTPUT NAME —
    // re-applying the keep EXPRESSIONS would resolve them against
    // the projected frame, where a derived keep's inputs no longer
    // exist (unresolved-column failure)
    val keepNames = projected.columns.dropRight(1)
    projected.select(keepNames.map(n => col(s"`$n`")) ++
      fields.map { case (n, _) => col(s"__m.$n").as(n) }: _*)
  }
}

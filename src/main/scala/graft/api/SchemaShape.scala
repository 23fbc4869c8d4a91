package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Document validation for [[GraftApi]] — the shape of the SERVED
  * schema, derived from the entity DataFrames' Spark schemas plus the
  * resolver-level fields (relational hydration, computed outputs).
  * graphql-yoga rejects a document selecting unknown fields or passing
  * unknown arguments at validation time with a named error
  * (`Cannot query field "x" on type "Y".`); without this, a typo'd
  * field silently serializes as JSON null and the client never learns.
  *
  * Deliberately scoped to what execution can actually check: unknown
  * FIELDS on object-shaped types and unknown ARGUMENT names. Argument
  * VALUES stay the permissive ArgsJson contract (unknown filter keys
  * ignored, like the reference's TransformFeedArgs), and map-typed /
  * schema-less columns are opaque (any selection inside passes). */
object SchemaShape {

  /** An object type: field name → shape. `opaque` = a type whose
    * interior cannot be validated (map columns, unwired tables) — all
    * selections inside pass. */
  final case class TypeShape(name: String,
                             fields: Map[String, FieldShape],
                             opaque: Boolean = false)

  /** One field: accepted argument names + the type its selections
    * validate against (None = leaf scalar — nested selections pass
    * unvalidated; a thunk so recursive types like SocialPost's
    * `parent_post: SocialPost` can tie the knot). */
  final case class FieldShape(args: Set[String] = Set.empty,
                              tpe: () => Option[TypeShape] = () => None)

  /** Derive a shape from a Spark type: structs become object types
    * (arrays validate against their element), maps are opaque,
    * scalars are leaves. */
  def fromDataType(name: String, dt: DataType): Option[TypeShape] =
    dt match {
      case s: StructType => Some(TypeShape(name,
        s.fields.map(f => f.name -> FieldShape(tpe =
          () => fromDataType(s"$name.${f.name}", f.dataType))).toMap))
      case ArrayType(e, _) => fromDataType(name, e)
      case _: MapType => Some(TypeShape(name, Map.empty, opaque = true))
      case _ => None
    }

  def fromFrame(name: String, df: DataFrame): TypeShape =
    fromDataType(name, df.schema).getOrElse(
      TypeShape(name, Map.empty, opaque = true))

  /** Union two shapes RECURSIVELY: a field of either side validates,
    * and a common field's interior is the union of both interiors.
    * Used to overlay the reference's DECLARED schema onto the
    * store-derived one — a top-level-only merge would still reject a
    * declared SUBFIELD of a struct the store carries partially (e.g.
    * a stats column missing total_hive_reward). Keeps `a`'s name;
    * either side opaque → opaque (anything inside passes). */
  def union(a: TypeShape, b: TypeShape): TypeShape =
    if (a.opaque || b.opaque) a.copy(opaque = true)
    else TypeShape(a.name,
      (a.fields.keySet ++ b.fields.keySet).map { k =>
        k -> ((a.fields.get(k), b.fields.get(k)) match {
          case (Some(fa), Some(fb)) => FieldShape(fa.args ++ fb.args,
            () => (fa.tpe(), fb.tpe()) match {
              case (Some(ta), Some(tb)) => Some(union(ta, tb))
              case (ta, tb) => ta.orElse(tb)
            })
          case (fa, fb) => fa.orElse(fb).get
        })
      }.toMap)

  /** Walk a selection tree against a shape; yoga-style messages for
    * every unknown field / unknown argument (all collected, not
    * first-error — a client fixes one round trip, not N).
    * `__typename` is the spec meta-field, valid on every type;
    * `__schema`/`__type` are the spec meta-fields of the ROOT query
    * type — validated as opaque there (sub-selections pass) so an
    * introspecting client (GraphiQL's first request, reference
    * api/index.ts:57) degrades to the executor's field-level
    * null/error answer instead of hard-failing validation. Inline
    * fragments validate against the enclosing shape (the served post
    * type is the HivePost/CeramicPost union). */
  def validate(sels: Seq[GraphQL.Selection], shape: TypeShape)
      : Seq[String] = {
    val errs = ArrayBuffer[String]()
    def go(sels: Seq[GraphQL.Selection], shape: TypeShape,
           root: Boolean): Unit =
      sels.foreach {
        case f: GraphQL.Field =>
          if (f.name == "__typename" || shape.opaque ||
              (root && (f.name == "__schema" || f.name == "__type"))) ()
          else shape.fields.get(f.name) match {
            case None => errs +=
              s"""Cannot query field "${f.name}" on type "${shape.name}"."""
            case Some(fs) =>
              f.args.map(_._1).filterNot(fs.args).foreach { a =>
                errs += s"""Unknown argument "$a" on field """ +
                  s""""${shape.name}.${f.name}"."""
              }
              fs.tpe().foreach(t => go(f.selections, t, root = false))
          }
        case GraphQL.InlineFragment(_, inner, _) => go(inner, shape, root)
        // only applyDirectives produces Excluded, and validation runs
        // before it — handled for exhaustiveness
        case GraphQL.Excluded => ()
      }
    go(sels, shape, root = true)
    errs.toSeq
  }
}

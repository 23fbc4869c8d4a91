package graft.query

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON → FeedArgs compiler: accepts the reference's GraphQL argument
  * object verbatim (schema.ts:284-291 FeedOptions + pagination), so a
  * client of the reference can ship its existing query arguments to
  * this engine unchanged.
  *
  * Shape (all fields optional, names as in the GraphQL schema):
  * {
  *   "spkvideo": {"only": true, "firstUpload": false, "isShort": false},
  *   "byTag": {"_eq": "video"}, "byCreator": {"_in": ["alice"]},
  *   "byCommunity": {...}, "byApp": {...}, "byType": {...},
  *   "byLang": {...}, "byPermlink": {...},
  *   "_or": [ {<FeedOptions>}, ... ],
  *   "includeComments": true, "includeCeramic": false,
  *   "byFollower": "bob",
  *   "pagination": {"limit": 100, "skip": 0}
  * }
  */
object ArgsJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): FeedArgs = fromNode(mapper.readTree(json))

  /** Field access treating explicit JSON null as absent — GraphQL
    * clients routinely serialize unset optionals as null. */
  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull)

  private def scalar(n: JsonNode): Any =
    if (n.isInt || n.isLong) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else n.asText()

  private def where(n: JsonNode): Where = Where(
    eq = opt(n, "_eq").map(scalar),
    ne = opt(n, "_ne").map(scalar),
    lt = opt(n, "_lt").map(scalar),
    gt = opt(n, "_gt").map(scalar),
    lte = opt(n, "_lte").map(scalar),
    gte = opt(n, "_gte").map(scalar),
    in = opt(n, "_in")
      .map(a => a.elements().asScala.filterNot(_.isNull)
        .map(scalar).toSeq),
    nin = opt(n, "_nin")
      .map(a => a.elements().asScala.filterNot(_.isNull)
        .map(scalar).toSeq),
    regex = opt(n, "_regex").map(_.asText()))

  private def fromNode(n: JsonNode): FeedArgs = {
    def w(field: String) = opt(n, field).map(where)
    val spk = opt(n, "spkvideo")
    val pag = opt(n, "pagination")
    FeedArgs(
      spkvideoFirstUpload = spk.exists(s =>
        opt(s, "firstUpload").exists(_.asBoolean())),
      spkvideoOnly = spk.exists(s =>
        opt(s, "only").exists(_.asBoolean())),
      spkvideoIsShort = spk.exists(s =>
        opt(s, "isShort").exists(_.asBoolean())),
      includeComments = opt(n, "includeComments")
        .exists(_.asBoolean()),
      byTag = w("byTag"), byCreator = w("byCreator"),
      byPermlink = w("byPermlink"), byCommunity = w("byCommunity"),
      byApp = w("byApp"), byType = w("byType"), byLang = w("byLang"),
      or = opt(n, "_or").toSeq
        .flatMap(a => a.elements().asScala.filterNot(_.isNull)
          .map(fromNode)),
      includeCeramic = opt(n, "includeCeramic")
        .exists(_.asBoolean()),
      byFollower = opt(n, "byFollower").map(_.asText()),
      // 0 = unset sentinel: each feed applies its own default
      // (JS `pagination?.limit || N` treats an explicit 0 the same)
      limit = pag.flatMap(p => opt(p, "limit").map(_.asInt()))
        .getOrElse(0),
      skip = pag.flatMap(p => opt(p, "skip").map(_.asInt()))
        .getOrElse(0))
  }
}

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

  private def scalar(n: JsonNode): Any =
    if (n.isInt || n.isLong) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else n.asText()

  private def where(n: JsonNode): Where = Where(
    eq = Option(n.get("_eq")).map(scalar),
    ne = Option(n.get("_ne")).map(scalar),
    lt = Option(n.get("_lt")).map(scalar),
    gt = Option(n.get("_gt")).map(scalar),
    lte = Option(n.get("_lte")).map(scalar),
    gte = Option(n.get("_gte")).map(scalar),
    in = Option(n.get("_in"))
      .map(a => a.elements().asScala.map(scalar).toSeq),
    nin = Option(n.get("_nin"))
      .map(a => a.elements().asScala.map(scalar).toSeq),
    regex = Option(n.get("_regex")).map(_.asText()))

  private def fromNode(n: JsonNode): FeedArgs = {
    def w(field: String) = Option(n.get(field)).map(where)
    val spk = Option(n.get("spkvideo"))
    val pag = Option(n.get("pagination"))
    FeedArgs(
      spkvideoFirstUpload = spk.exists(s =>
        Option(s.get("firstUpload")).exists(_.asBoolean())),
      spkvideoOnly = spk.exists(s =>
        Option(s.get("only")).exists(_.asBoolean())),
      spkvideoIsShort = spk.exists(s =>
        Option(s.get("isShort")).exists(_.asBoolean())),
      includeComments = Option(n.get("includeComments"))
        .exists(_.asBoolean()),
      byTag = w("byTag"), byCreator = w("byCreator"),
      byPermlink = w("byPermlink"), byCommunity = w("byCommunity"),
      byApp = w("byApp"), byType = w("byType"), byLang = w("byLang"),
      or = Option(n.get("_or")).toSeq
        .flatMap(a => a.elements().asScala.map(fromNode)),
      includeCeramic = Option(n.get("includeCeramic"))
        .exists(_.asBoolean()),
      byFollower = Option(n.get("byFollower")).map(_.asText()),
      limit = pag.flatMap(p => Option(p.get("limit")).map(_.asInt()))
        .getOrElse(100),
      skip = pag.flatMap(p => Option(p.get("skip")).map(_.asInt()))
        .getOrElse(0))
  }
}

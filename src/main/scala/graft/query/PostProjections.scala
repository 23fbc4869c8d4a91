package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Read-side computed fields — the reference's GraphQL field
  * resolvers (SURVEY.md §2.2 P1-P8; resolvers/posts.ts,
  * resolvers/profiles.ts, resolvers/index.ts:413-420) as column
  * expressions, so hydrating a feed page is part of the same plan
  * instead of per-row resolver calls.
  */
object PostProjections {


  /** P1 refs: ["hive:<author>:<permlink>"] (posts.ts:37-40). */
  def refs: Column =
    array(concat_ws(":", lit("hive"), col("author"), col("permlink")))

  /** P2 json_metadata projection {image, app, raw} (posts.ts:50-56). */
  def jsonMetadataProjection: Column = {
    val meta = from_json(col("json_metadata_raw"),
      graft.domain.Schemas.commentMeta)
    struct(
      meta.getField("image").as("image"),
      meta.getField("app").as("app"),
      col("json_metadata_raw").as("raw"))
  }

  /** P3 lang: video.info.lang else null (posts.ts:79-86). */
  def lang: Column =
    get_json_object(col("json_metadata_raw"), "$.video.info.lang")

  /** P4 community_ref: parent_permlink iff it starts with 'hive-'
    * (posts.ts:88-94). */
  def communityRef: Column =
    when(col("parent_permlink").startsWith("hive-"),
      col("parent_permlink")).otherwise(lit(null).cast("string"))

  /** P5 spkvideo projection (posts.ts:104-130): null unless
    * json_metadata.video.info.duration is truthy (a 0 duration is
    * falsy ⇒ null, like the reference's `!...duration` gate);
    * thumbnail_url = last image (falsy ⇒ CDN default thumbnail);
    * play_url = sourceMap entry with type='video' else the b-cdn
    * template; height/width default 0, is_short defaults false; body
    * stripped of the 3speak header (X15) — undefined (null) when the
    * body has no `---\n\n` header, exactly like split()[1]. */
  def spkvideoProjection: Column = {
    val meta = from_json(col("json_metadata_raw"),
      graft.domain.Schemas.commentMeta)
    val info = meta.getField("video").getField("info")
    val srcMap = info.getField("sourceMap")
    val playEntry = try_element_at(
      filter(srcMap, e => e.getField("type") === "video"), lit(1))
    val images = meta.getField("image")
    val sv = col("app_metadata.spkvideo")
    // try_element_at: ANSI mode makes element_at THROW on an empty
    // image array / header-less body; the reference's .pop() and
    // split()[1] return undefined harmlessly — mirror that.
    when(info.getField("duration").isNotNull &&
      info.getField("duration") =!= 0.0, struct(
      coalesce(nullif(try_element_at(images, lit(-1)), lit("")),
        format_string(
          "https://media.3speak.tv/%s/thumbnails/default.png",
          col("permlink"))).as("thumbnail_url"),
      coalesce(nullif(playEntry.getField("url"), lit("")),
        format_string(
          "https://threespeakvideo.b-cdn.net/%s/default.m3u8",
          col("permlink"))).as("play_url"),
      info.getField("duration").as("duration"),
      coalesce(sv.getField("height"), lit(0)).as("height"),
      coalesce(sv.getField("width"), lit(0)).as("width"),
      coalesce(sv.getField("is_short"), lit(false)).as("is_short"),
      try_element_at(split(col("body"), "---\n\n"), lit(2)).as("body")))
      .otherwise(lit(null).cast(
        "struct<thumbnail_url:string,play_url:string,duration:double," +
          "height:int,width:int,is_short:boolean,body:string>"))
  }

  /** P6 __typename dispatch (posts.ts:70-77). */
  def typename: Column =
    when(col("TYPE") === "HIVE", lit("HivePost"))
      .when(col("__t") === "post_ceramic", lit("CeramicPost"))
      .otherwise(lit(null).cast("string"))

  /** Attach all post projections (what a GraphQL selection of every
    * computed field compiles to). */
  def project(posts: DataFrame): DataFrame =
    posts
      .withColumn("refs", refs)
      .withColumn("json_metadata", jsonMetadataProjection)
      .withColumn("lang", lang)
      .withColumn("community_ref", communityRef)
      .withColumn("spkvideo", spkvideoProjection)
      .withColumn("__typename", typename)

  /** JS `x || null`: empty string (falsy) collapses to null. */
  private def orNull(c: Column): Column = when(c =!= "", c)

  /** P7 profile projection with null fallbacks
    * (resolvers/profiles.ts:13-67): id = the `_id` key, name =
    * displayName or null (no username fallback); `|| null` getters
    * collapse empty strings to null. */
  def profileView(profiles: DataFrame): DataFrame =
    profiles.select(
      col("_id").as("id"),
      col("username"),
      orNull(col("displayName")).as("name"),
      orNull(col("about")).as("about"),
      orNull(col("location")).as("location"),
      orNull(col("website")).as("website"),
      col("did"),
      struct(col("images.avatar").as("avatar"),
        col("images.cover").as("cover")).as("images"),
      col("extra.pinned_post").as("pinned_post"),
      col("score"),
      lit("HiveProfile").as("__typename"))

  /** P7 (Ceramic variant): about←description, website←url,
    * avatar←image.original.src, background←background.original.src —
    * no falsy fallbacks on this class (resolvers/profiles.ts:108-150).
    */
  def ceramicProfileView(ceramicProfiles: DataFrame): DataFrame =
    ceramicProfiles.select(
      col("did").as("id"),
      col("name"),
      col("description").as("about"),
      col("location"),
      col("url").as("website"),
      col("did"),
      struct(col("image.original.src").as("avatar"),
        col("background.original.src").as("background")).as("images"),
      lit("CeramicProfile").as("__typename"))

  /** P8 community roles unpack: [[username, role, title]] → array of
    * structs (resolvers/index.ts:413-420). */
  def rolesUnpacked: Column =
    transform(col("roles"), r => struct(
      r.getItem(0).as("username"),
      r.getItem(1).as("role"),
      r.getItem(2).as("title")))

  /** Q4 community(id) point row: `hive/`-prefixed key lookup with
    * unpacked roles (resolvers/index.ts:406-424) — the half shared by
    * [[community]] and the GraphQL resolver (which builds the nested
    * feeds itself from the nested field's own arguments). */
  def communityRow(communities: DataFrame, id: String): DataFrame = {
    val base = communities.filter(col("_id") === s"hive/$id")
      .withColumn("roles_unpacked", rolesUnpacked)
    // created_at?.toISOString() (resolvers/index.ts:424) — optional
    // chaining: a document without the field serializes nothing
    (if (communities.columns.contains("created_at"))
      base.withColumn("created_at_iso",
        date_format(col("created_at"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
    else base).limit(1)
  }

  /** Q4 community(id): point lookup + two nested feeds with
    * byCommunity forced (resolvers/index.ts:406-453). Returns
    * (community row with unpacked roles, trending feed, new feed). */
  def community(communities: DataFrame, posts: DataFrame,
                follows: DataFrame, id: String,
                feedLimit: Int = 100)
      : (DataFrame, DataFrame, DataFrame) = {
    val row = communityRow(communities, id)
    val forced = FeedArgs(
      byCommunity = Some(Where(eq = Some(id))), limit = feedLimit)
    val trending = PostQueries.trendingFeed(posts, follows, forced)
    val newest = PostQueries.socialFeed(posts, follows, forced)
    (row, trending, newest)
  }
}

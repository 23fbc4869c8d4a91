package graft.ingest

import graft.domain.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block → operation extraction (ingest plane, SURVEY.md §3.2).
  *
  * The reference walks blocks sequentially, per-tx, per-op
  * (src/workers/hive-stream.ts:199-222). Relationally that's two
  * generators: explode(transactions) → posexplode(operations). Block
  * height is decoded from the hex block id prefix exactly like
  * `parseInt(block_id.slice(0,8), 16)` (src/utils.ts:93) — X13.
  *
  * The reference's reorder buffer (utils.ts:55-68) has no equivalent
  * here: op order is carried as (block_height, op_index) columns and
  * restored relationally wherever semantics need it, so extraction
  * stays embarrassingly parallel at any scale.
  */
object OpExtract {

  /** blocks (Schemas.block) → one row per operation:
    * (block_height, ts, trx_id, op_index, op_name, payload). */
  def ops(blocks: DataFrame): DataFrame =
    blocks
      .withColumn("block_height",
        conv(substring(col("block_id"), 1, 8), 16, 10).cast("long"))
      .withColumn("ts", to_timestamp(col("timestamp")))
      .select(col("block_height"), col("ts"),
        explode(col("transactions")).as("tx"))
      .select(col("block_height"), col("ts"),
        col("tx.transaction_id").as("trx_id"),
        posexplode(col("tx.operations")).as(Seq("op_index", "op")))
      .select(col("block_height"), col("ts"), col("trx_id"),
        col("op_index"),
        col("op.name").as("op_name"),
        col("op.payload").as("payload"))

  /** Per-transaction sibling-op facts (J10, hive-stream.ts:589-620):
    * beneficiaries from the comment_options op and authority_signed
    * from a 3speak-publish custom_json — ONE groupBy per batch instead
    * of the reference's positional per-row lookups.
    */
  def txSiblingFacts(ops: DataFrame): DataFrame = {
    val benefSchema = "array<struct<account:string,weight:int>>"
    ops.groupBy("block_height", "trx_id").agg(
      // FIRST comment_options op's beneficiaries extension — by
      // op_index, not max() over the JSON string (which would pick
      // the lexicographically greatest payload when a tx carries
      // several comment_options ops)
      from_json(
        min_by(when(col("op_name") === "comment_options",
          get_json_object(col("payload"),
            "$.extensions[0][1].beneficiaries")),
          when(col("op_name") === "comment_options", col("op_index"))),
        graft.ddl(benefSchema)).as("beneficiaries"),
      max(when(col("op_name") === "custom_json" &&
        get_json_object(col("payload"), "$.id") === "3speak-publish" &&
        get_json_object(col("payload"),
          "$.required_posting_auths[0]") === "threespeak",
        lit(true)).otherwise(false)).as("authority_signed"))
  }
}

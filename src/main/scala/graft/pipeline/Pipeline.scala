package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** The reference's one hand-fused "query", as a declarative Spark plan
  * (SURVEY.md §3.1): decode → type filter → route → grok → enrichment
  * join → computed columns → date-partitioned documents.
  *
  * The same DataFrame code path serves batch and Structured Streaming
  * (pass a streaming `records` frame) — Spark's core design point. The
  * plan is deliberately *shuffle-free* on the fact side (filters,
  * projections, native expressions, broadcast join only), preserving
  * the reference's per-shard ordering property and scaling linearly
  * with input partitions (SURVEY.md §4).
  */
object Pipeline {

  /** Envelope decode (row 2): binary → struct, malformed → null. */
  def decode(data: Column): Column = Bridge.column(EnvelopeDecode(Bridge.expression(data)))

  /** Full assembly over source records
    * (data, sequenceNumber, approximateArrivalTimestamp) ⋈ dims.
    * Malformed records are counted via the observe() node and then
    * dropped, like the reference's count+log (`main.go:356-360`).
    *
    * @param dims resolved app dimension ([[Enrich.resolveDims]])
    * @param includeDormant resurrect the reference's commented-out
    *   routes (see [[Classifier.family]])
    */
  def assemble(records: DataFrame, dims: DataFrame,
               includeDormant: Boolean = false): DataFrame =
    assembleDecoded(withEnv(records), dims, includeDormant)

  /** Adds the decoded `env` column (row 2). Callers that need the
    * decode output for their own routing (e.g. the dead-letter split)
    * apply this once, persist, and pass the result to
    * [[assembleDecoded]] — the decode then runs once per record, not
    * once per consumer.
    */
  def withEnv(records: DataFrame): DataFrame =
    records.withColumn("env", decode(col("data")))

  /** [[assemble]] over a frame that already carries the decoded `env`
    * column (malformed rows = null env; still counted by the metrics
    * node, then dropped).
    */
  def assembleDecoded(decoded: DataFrame, dims: DataFrame,
                      includeDormant: Boolean = false): DataFrame = {
    val grokked = parsed(decoded, includeDormant)
    // row 6: enrichment broadcast join (+ drop when no app key)
    computedColumns(Enrich.enrich(
      grokked, dims,
      appId = col("env.log_message.app_id"),
      rtrAppId = coalesce(col("captures").getItem("rtr_app_id"), lit(""))))
  }

  /** [[assemble]] with per-origin dimension universes
    * ([[Enrich.enrichPerOrigin]]; reference `main.go:79-109`): the
    * lookup origin is the decoded envelope's, exactly as
    * `augmentWithAppInfo(values, ..., newEvent.GetOrigin())` selects
    * the per-origin cache at `main.go:416,421`.
    *
    * @param originDims (origin, app_guid, …) dimension union
    */
  def assembleMultiEnv(records: DataFrame, originDims: DataFrame,
                       includeDormant: Boolean = false): DataFrame = {
    val grokked = parsed(withEnv(records), includeDormant)
    computedColumns(Enrich.enrichPerOrigin(
      grokked, originDims,
      origin = col("env.origin"),
      appId = col("env.log_message.app_id"),
      rtrAppId = coalesce(col("captures").getItem("rtr_app_id"), lit(""))))
  }

  /** Metrics → type filter → route → grok over a decoded frame: the
    * shared head of both enrichment variants (rows 3-5; row 2's decode
    * comes in via [[withEnv]]).
    */
  private def parsed(decoded: DataFrame, includeDormant: Boolean): DataFrame = {
    val env = decoded
      // the reference's two Prometheus counters (main.go:40-52): total
      // seen + malformed, surfaced per batch via observed metrics
      .observe("graft_pipeline",
        count(lit(1)).as("records_total"),
        count(when(col("env").isNull, 1)).as("malformed_total"))
      .filter(col("env").isNotNull) // malformed → dropped (counted above)
      .filter(col("env.event_type") === "LogMessage") // row 3
      .withColumn("family", Classifier.family(
        col("env.log_message.source_instance"),
        col("env.tags"),
        col("env.log_message.source_type"),
        includeDormant)) // row 4
      .filter(col("family").isNotNull)

    // row 5: grok parse, pattern selected per family (active families
    // use %{GENERIC}; resurrected dormant ones bring their own, e.g.
    // %{ROUTERACCESS} with typed captures for gorouter_access)
    val patterns =
      if (includeDormant) Classifier.allFamilyPatterns else Classifier.familyPatterns
    patterns.foldLeft(env) { case (df, (fam, pat)) =>
      df.withColumn("captures",
        when(col("family") === fam,
          graft.functions.grok_extract_map(col("env.log_message.message"), pat))
          .otherwise(if (df.columns.contains("captures")) col("captures")
            else lit(null).cast("map<string,string>")))
    }
  }

  /** Rows 7-9: computed columns + partition key. */
  private def computedColumns(enriched: DataFrame): DataFrame =
    enriched
      .withColumn("timestamp", unix_millis(col("approximateArrivalTimestamp"))) // epoch millis, main.go:435-438
      .withColumn("file_path", col("env.log_message.source_instance"))
      .withColumn("@cf.env", col("env.origin"))
      .withColumn("dt", date_format(col("approximateArrivalTimestamp"), "yyyy-MM-dd"))
      .withColumn("es_index", concat(col("family"), lit("-"), col("dt")))

  /** Projects the dynamic ES document: grok captures + computed +
    * `@cf.*` columns as one JSON string (`main.go:432-447` shape).
    * Null `@cf.*` columns (enrichment failure with
    * IgnoreMissingApps=false) are OMITTED from the document, like the
    * reference's `augmentWithAppInfo` error path that never sets the
    * keys (`main.go:417-419`).
    */
  def toJsonDocs(assembled: DataFrame): DataFrame = {
    val cfCols = Seq("@cf.app", "@cf.app_id", "@cf.space", "@cf.space_id", "@cf.org", "@cf.org_id")
    val cfMap = map_filter(
      map(cfCols.flatMap(c => Seq(lit(c), col(s"`$c`"))): _*),
      (_, v) => v.isNotNull)
    // a grok capture named like a computed/@cf key loses to the
    // computed value ONLY when that value is actually written — the
    // reference builds the doc map capture-first and the later writes
    // win (main.go:432-440), but the enrichment-error path never sets
    // the six @cf.* keys (main.go:417-419), so a same-named capture
    // survives there. file_path/@cf.env are always written. Dropping
    // exactly the overwritten keys keeps map_concat safe under the
    // default mapKeyDedupPolicy=EXCEPTION without diverging.
    val overwritten: Column => Column = k =>
      cfCols.map(c => (k === c) && col(s"`$c`").isNotNull)
        .foldLeft(k.isInCollection(Seq("file_path", "@cf.env")))(_ || _)
    val captures = map_filter(
      coalesce(col("captures"), map()),
      (k, _) => !overwritten(k))
    val stringPart = map_concat(
      captures,
      cfMap,
      map(lit("file_path"), col("file_path"), lit("@cf.env"), col("`@cf.env`")))
    assembled.select(
      col("es_index"),
      col("dt"),
      docId.as("doc_id"),
      to_json(struct(stringPart.as("fields"), col("timestamp"))).as("doc"))
  }

  /** Deterministic doc id = hash(index, source sequence number):
    * replays upsert the same id ⇒ effectively-once into an idempotent
    * sink (the improvement SURVEY §7.4-3 calls for over the
    * reference's auto-id at-least-once). ONE rule, shared by
    * [[toJsonDocs]] and the streaming near-dup monitor, so pairs the
    * monitor emits join directly against sink documents.
    */
  def docId: Column = md5(concat_ws(":", col("es_index"), col("sequenceNumber")))

  /** Date-partitioned append sink (row 10/13 for a file-based target):
    * one directory per ES index, partition auto-create for free.
    */
  def writePartitioned(assembled: DataFrame, root: String): Unit =
    toJsonDocs(assembled)
      .write.mode("append").partitionBy("es_index").parquet(root)
}

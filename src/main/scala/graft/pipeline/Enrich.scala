package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream × slowly-changing-dimension enrichment (SURVEY.md §2 row 6).
  *
  * The reference does a per-record read-through-cached lookup chain
  * app → space → org (`caching_lazyfill.go:241-265`); Spark-first this
  * is a *broadcast hash join* against a pre-resolved dimension
  * DataFrame — re-resolved per micro-batch in streaming, which is the
  * natural expression of the 6h-TTL cache refresh. At 100 TB the fact
  * side never shuffles: the dimension (≤ millions of apps) broadcasts.
  *
  * Semantics preserved (tested as a truth table):
  *  - key = log's app_id, else the grok-parsed rtr_app_id, else the
  *    row is DROPPED (`main.go:414-430`);
  *  - with IgnoreMissingApps=true (the deployed config, `main.go:103`)
  *    `GetApp` NEVER fails: an invalid guid or a miss at any chain
  *    step degrades to `entity{}` (`caching_lazyfill.go:241-248,
  *    219-238`), so all six keys are set — names/chain-ids empty,
  *    `@cf.app_id` = the RAW input guid, case preserved
  *    (`caching_lazyfill.go:255` uses the caller's appGuid verbatim;
  *    canonicalization is cache-key-only, `:88-93`);
  *  - with IgnoreMissingApps=false any failure errors out of
  *    `augmentWithAppInfo`, and `main.go:417-419` keeps the row
  *    WITHOUT the six keys (here: all six null → omitted by
  *    [[Pipeline.toJsonDocs]]);
  *  - app-name suffix strip, first match only, list order
  *    (`caching_lazyfill.go:140-150`; list `main.go:104`).
  */
object Enrich {

  val DefaultStripSuffixes: Seq[String] = Seq("-venerable", "-blue", "-green")

  private val UuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** Strip the first matching suffix (list order), at most one. */
  def stripFirstSuffix(name: Column, suffixes: Seq[String] = DefaultStripSuffixes): Column =
    // foldRight nests later suffixes innermost => first match wins
    suffixes.foldRight(name) { (suf, rest) =>
      when(name.endsWith(suf), name.substr(lit(1), length(name) - lit(suf.length)))
        .otherwise(rest)
    }

  /** Resolves apps ⋈ spaces ⋈ orgs into the flat dimension the join
    * broadcasts (the `FillCache`/`GetApp` output shape, `App` at
    * `caching/caching.go:9-17`). Missing space/org → empty strings
    * (IgnoreMissingApps chain).
    *
    * @param apps   (app_guid, name, space_guid)
    * @param spaces (space_guid, name, org_guid)
    * @param orgs   (org_guid, name)
    */
  def resolveDims(
      apps: DataFrame,
      spaces: DataFrame,
      orgs: DataFrame,
      stripSuffixes: Seq[String] = DefaultStripSuffixes,
      canonicalizeGuids: Boolean = true): DataFrame = {
    val canon: Column => Column = c => if (canonicalizeGuids) lower(c) else c
    val a = apps.select(
      canon(col("app_guid")).as("app_guid"),
      stripFirstSuffix(col("name"), stripSuffixes).as("app_name"),
      canon(col("space_guid")).as("space_guid"))
    val s = spaces.select(
      canon(col("space_guid")).as("s_space_guid"),
      col("name").as("space_name"),
      canon(col("org_guid")).as("s_org_guid"))
    val o = orgs.select(
      canon(col("org_guid")).as("o_org_guid"),
      col("name").as("org_name"))
    a.join(s, a("space_guid") === s("s_space_guid"), "left")
      .join(o, s("s_org_guid") === o("o_org_guid"), "left")
      .select(
        col("app_guid"),
        coalesce(col("app_name"), lit("")).as("app_name"),
        coalesce(col("space_guid"), lit("")).as("space_guid"),
        coalesce(col("space_name"), lit("")).as("space_name"),
        coalesce(col("s_org_guid"), lit("")).as("org_guid"),
        coalesce(col("org_name"), lit("")).as("org_name"))
  }

  /** Adds the six `@cf.*` columns to `logs` via broadcast left join,
    * dropping rows with no resolvable key.
    *
    * @param appId             primary key column (log_message.app_id)
    * @param rtrAppId          fallback key column (grok'd rtr_app_id);
    *                          pass lit("") if not applicable
    * @param ignoreMissingApps true (deployed config): invalid guid or
    *                          miss at any step → keys set with empty
    *                          names and the RAW guid. false: any
    *                          failure → all six columns null (row kept
    *                          without the keys downstream)
    * @param validateGuid      when true, non-UUID keys never match the
    *                          dimension (the uuid-parse gate); when
    *                          false keys join as-is (synthetic ids)
    */
  /** Key derivation shared by both enrichment variants: fallback
    * chain, inner-drop on no key, uuid gate, canonicalized join key
    * (cache-key canonicalization, caching_lazyfill.go:88-93 — invalid
    * guids never match).
    */
  private def keyedFrame(logs: DataFrame, appId: Column, rtrAppId: Column,
                         validateGuid: Boolean): DataFrame = {
    val key = when(appId =!= "", appId).when(rtrAppId =!= "", rtrAppId)
    logs
      .withColumn("__key_raw", key)
      .filter(col("__key_raw").isNotNull) // inner-drop: no identifiable app
      .withColumn("__key_valid",
        if (validateGuid) col("__key_raw").rlike(UuidRe) else lit(true))
      .withColumn("__key", when(col("__key_valid"), lower(col("__key_raw"))))
  }

  /** Broadcast-ready dimension projection (optionally origin-keyed). */
  private def dimSide(dims: DataFrame, withOrigin: Boolean): DataFrame = {
    val cols = Seq(
      col("app_guid").as("__d_guid"), col("app_name").as("__d_app"),
      col("space_guid").as("__d_space_id"), col("space_name").as("__d_space"),
      col("org_guid").as("__d_org_id"), col("org_name").as("__d_org"))
    broadcast(dims.select(
      (if (withOrigin) col("origin").as("__d_origin") +: cols else cols): _*))
  }

  /** The six output columns + scratch-column cleanup, shared by both
    * variants. `ok` = the rows whose keys get set; everything else
    * gets nulls (omitted downstream by [[Pipeline.toJsonDocs]]).
    */
  private def projectEnrichment(joined: DataFrame, ok: Column, colPrefix: String,
                                extraDrop: Seq[String]): DataFrame =
    joined
      .withColumn(colPrefix + "app", when(ok, coalesce(col("__d_app"), lit(""))))
      .withColumn(colPrefix + "app_id", when(ok, col("__key_raw"))) // RAW, case preserved
      .withColumn(colPrefix + "space", when(ok, coalesce(col("__d_space"), lit(""))))
      .withColumn(colPrefix + "space_id", when(ok, coalesce(col("__d_space_id"), lit(""))))
      .withColumn(colPrefix + "org", when(ok, coalesce(col("__d_org"), lit(""))))
      .withColumn(colPrefix + "org_id", when(ok, coalesce(col("__d_org_id"), lit(""))))
      .drop(Seq("__key_raw", "__key_valid", "__key",
        "__d_guid", "__d_app", "__d_space_id", "__d_space", "__d_org_id", "__d_org") ++
        extraDrop: _*)

  def enrich(
      logs: DataFrame,
      dims: DataFrame,
      appId: Column,
      rtrAppId: Column,
      ignoreMissingApps: Boolean = true,
      validateGuid: Boolean = true,
      colPrefix: String = "@cf."): DataFrame = {
    val keyed = keyedFrame(logs, appId, rtrAppId, validateGuid)
    val d = dimSide(dims, withOrigin = false)
    val joined = keyed.join(d, keyed("__key") === d("__d_guid"), "left")
    // "ok" = the rows whose six keys get set: everything under
    // IgnoreMissingApps, only actual matches otherwise
    val ok = if (ignoreMissingApps) lit(true)
      else col("__key_valid") && col("__d_guid").isNotNull
    projectEnrichment(joined, ok, colPrefix, extraDrop = Nil)
  }

  /** Multi-environment enrichment: one dimension universe per ORIGIN
    * (reference `main.go:79-109` keeps one CF client + lazy-fill cache
    * per `origin`, selected by `envelope.GetOrigin()` at
    * `main.go:416,421`; `main.go:332` + `:94`: an origin with no
    * configured client errors out of `augmentWithAppInfo`, and the
    * `"ignoring:"` path at `main.go:417-419` KEEPS the row without the
    * six keys — unlike a missing app id, which drops it).
    *
    * Spark-first this is the same broadcast hash join as [[enrich]],
    * with the dimension keyed on (origin, app_guid) — a union of the
    * per-environment dimension frames — plus a broadcast
    * recognised-origin set standing in for the `CFClients` map. The
    * fact side still never shuffles; dims stay broadcast-sized (the
    * per-origin union multiplies rows by the handful of environments,
    * not by data volume).
    *
    * Truth table (extends [[enrich]]'s):
    *  - no resolvable key → row dropped (both modes, as before);
    *  - origin NOT in dims → all six columns null, row kept;
    *  - origin known: exactly [[enrich]]'s IgnoreMissingApps semantics
    *    within that origin's dimension universe.
    *
    * @param dims (origin, app_guid, app_name, space_guid, space_name,
    *             org_guid, org_name) — e.g. per-env [[resolveDims]]
    *             outputs with an `origin` literal column, unioned
    */
  def enrichPerOrigin(
      logs: DataFrame,
      dims: DataFrame,
      origin: Column,
      appId: Column,
      rtrAppId: Column,
      ignoreMissingApps: Boolean = true,
      validateGuid: Boolean = true,
      colPrefix: String = "@cf."): DataFrame = {
    val keyed = keyedFrame(logs.withColumn("__origin", origin), appId, rtrAppId, validateGuid)
    // the CFClients map: which origins have a configured environment
    val known = broadcast(dims.select(col("origin").as("__k_origin")).distinct())
    val d = dimSide(dims, withOrigin = true)
    val joined = keyed
      .join(known, keyed("__origin") === known("__k_origin"), "left")
      .join(d, col("__origin") === col("__d_origin") && col("__key") === col("__d_guid"), "left")
    val originKnown = col("__k_origin").isNotNull
    val ok = if (ignoreMissingApps) originKnown
      else originKnown && col("__key_valid") && col("__d_guid").isNotNull
    projectEnrichment(joined, ok, colPrefix,
      extraDrop = Seq("__origin", "__k_origin", "__d_origin"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declared query battery: one entry per implemented operator from
  * SURVEY.md §2 plus the training-data ops (dedup / similarity / text /
  * multimodal). Each query has a DuckDB-oracle SQL twin in [[oracles]].
  *
  * Determinism rules (driver hashes values after sorting columns by
  * name): every query ends in an explicit ORDER BY on its full key, and
  * every computed column is aliased identically on both sides.
  */
object Queries {

  private type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-shaped aggregation (pricing summary) over lineitem.
    * Scale notes: single shuffle on the 2 low-cardinality grouping keys
    * with map-side partial aggregation; scan reads only the 7 needed
    * columns (verified via explain ReadSchema).
    */
  private val q1Agg: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Grok extraction (SURVEY §2 row 5) over the events stream table:
    * typed capture (`:int`) from the raw payload via the native
    * GrokExtract expression — stays inside WholeStageCodegen.
    */
  private val qGrok: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    ev.select(col("event_id"),
        graft.functions.grok_extract(col("props"), """\{"k": %{INT:k_val:int}\}""").as("g"))
      .select(col("event_id"), col("g.k_val").as("k_val"))
      .orderBy("event_id")
  }

  /** Multi-way CASE routing (SURVEY §2 row 4) via Classifier.family,
    * driving the real rule chain (incl. drop-before-keep ordering: a
    * gorouter tag on an access-log path still drops) over synthetic
    * envelope columns derived from events.
    */
  private val qRoute: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val si = when(col("user_id") % 5 === 0, lit("/var/log/messages"))
      .when(col("user_id") % 5 === 1, lit("/var/vcap/sys/log/gorouter/access.log"))
      .when(col("user_id") % 5 === 2, lit("/var/vcap/sys/log/director/debug.log"))
      .when(col("user_id") % 5 === 3, lit("/var/vcap/sys/log/other/x.log"))
      .otherwise(lit("router/0"))
    val tags = when(col("event_type") === "click",
      map(lit("source_id"), lit("gorouter"))).otherwise(map())
    val st = when(col("event_type") === "purchase", lit("APP/PROC/WEB")).otherwise(lit("OTHER"))
    ev.withColumn("family", pipeline.Classifier.family(si, tags, st))
      .groupBy(coalesce(col("family"), lit("dropped")).as("family"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("family")
  }

  /** Enrichment broadcast join (SURVEY §2 row 6): app→space→org chain
    * with suffix-strip + key-fallback + inner-drop semantics, dims
    * stood in by customer→nation→region.
    */
  private val qEnrich: Q = (spark, dir) => {
    val apps = Tables(spark, dir, "customer").select(
      col("c_custkey").cast("string").as("app_guid"),
      concat(col("c_name"),
        when(col("c_custkey") % 4 === 0, lit("-venerable"))
          .when(col("c_custkey") % 4 === 1, lit("-blue"))
          .when(col("c_custkey") % 4 === 2, lit("-blue-green"))
          .otherwise(lit(""))).as("name"),
      col("c_nationkey").cast("string").as("space_guid"))
    val spaces = Tables(spark, dir, "nation").select(
      col("n_nationkey").cast("string").as("space_guid"),
      col("n_name").as("name"),
      col("n_regionkey").cast("string").as("org_guid"))
    val orgs = Tables(spark, dir, "region").select(
      col("r_regionkey").cast("string").as("org_guid"),
      col("r_name").as("name"))
    val dims = pipeline.Enrich.resolveDims(apps, spaces, orgs, canonicalizeGuids = false)
    val logs = Tables.events(spark, dir)
    val appId = when(col("user_id") % 7 =!= 0, col("user_id").cast("string")).otherwise(lit(""))
    val rtrAppId = when(col("event_type") =!= "error", (col("user_id") * 3).cast("string"))
      .otherwise(lit(""))
    pipeline.Enrich.enrich(logs, dims, appId, rtrAppId,
        validateGuid = false, colPrefix = "cf_")
      .select(col("event_id"), col("cf_app_id"), col("cf_app"), col("cf_space"), col("cf_org"))
      .orderBy("event_id")
  }

  /** Per-origin (multi-environment) enrichment (reference
    * `main.go:79-109`): the dimension universe is keyed by
    * (origin, app_guid) — env1 and env2 resolve the same guid to
    * different names, env3 has no configured environment so its rows
    * keep all-null keys (the `"ignoring: origin not recognised"` path).
    */
  private val qEnrichOrigin: Q = (spark, dir) => {
    val apps = Tables(spark, dir, "customer").select(
      col("c_custkey").cast("string").as("app_guid"),
      concat(col("c_name"),
        when(col("c_custkey") % 4 === 0, lit("-venerable"))
          .when(col("c_custkey") % 4 === 1, lit("-blue"))
          .when(col("c_custkey") % 4 === 2, lit("-blue-green"))
          .otherwise(lit(""))).as("name"),
      col("c_nationkey").cast("string").as("space_guid"))
    val spaces = Tables(spark, dir, "nation").select(
      col("n_nationkey").cast("string").as("space_guid"),
      col("n_name").as("name"),
      col("n_regionkey").cast("string").as("org_guid"))
    val orgs = Tables(spark, dir, "region").select(
      col("r_regionkey").cast("string").as("org_guid"),
      col("r_name").as("name"))
    val dims1 = pipeline.Enrich.resolveDims(apps, spaces, orgs, canonicalizeGuids = false)
    val dims = dims1.withColumn("origin", lit("env1"))
      .unionByName(dims1.withColumn("app_name", upper(col("app_name")))
        .withColumn("origin", lit("env2")))
    val logs = Tables.events(spark, dir)
    val originCol = concat(lit("env"), ((col("user_id") % 3) + 1).cast("string"))
    val appId = when(col("user_id") % 7 =!= 0, col("user_id").cast("string")).otherwise(lit(""))
    val rtrAppId = when(col("event_type") =!= "error", (col("user_id") * 3).cast("string"))
      .otherwise(lit(""))
    pipeline.Enrich.enrichPerOrigin(logs, dims, originCol, appId, rtrAppId,
        validateGuid = false, colPrefix = "cf_")
      .withColumn("origin", originCol)
      .select(col("event_id"), col("origin"),
        col("cf_app_id"), col("cf_app"), col("cf_space"), col("cf_org"))
      .orderBy("event_id")
  }

  /** Computed columns + partition-key derivation (SURVEY §2 rows 8-9):
    * epoch-millis timestamp and daily index name.
    */
  private val qComputed: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    ev.select(
        col("event_id"),
        col("ts_ms"),
        date_format(col("ts_t"), "yyyy-MM-dd").as("dt"))
      .withColumn("es_index", concat(lit("gorouter-"), col("dt")))
      .orderBy("event_id")
  }

  /** Retention / partition expiry (SURVEY §2 row 12): the keep/drop
    * rule over daily index names (plus the undated/.kibana quirks),
    * cutoff = max date − 2 days, evaluated set-oriented.
    */
  private val qRetention: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val idx = ev.groupBy(date_format(col("ts_t"), "yyyy-MM-dd").as("dt"))
      .agg(count(lit(1)).as("cnt"))
      .select(concat(lit("gorouter-"), col("dt")).as("index_name"), col("cnt"))
      .unionAll(spark.range(1).select(lit(".kibana").as("index_name"), lit(0L).as("cnt")))
      .unionAll(spark.range(1).select(lit("undated_index").as("index_name"), lit(0L).as("cnt")))
    // cutoff is a 1-row scalar aggregate cross-joined into the plan
    // (broadcast nested loop of a single row) — fully declarative, no
    // driver-side collect. An EMPTY source yields a null max ⇒ the
    // cutoff coalesces to a keep-all sentinel (retention must never
    // silently expire every dated index just because no data arrived).
    val cutoff = ev.agg(coalesce(date_format(
      date_sub(to_date(max(date_format(col("ts_t"), "yyyy-MM-dd"))), 2), "yyyy-MM-dd"),
      lit("0000-00-00"))
      .as("__cutoff"))
    idx.crossJoin(broadcast(cutoff))
      .filter(pipeline.Retention.shouldKeepCol(col("index_name"), col("__cutoff")))
      .drop("__cutoff")
      .orderBy("index_name")
  }

  /** q265: GROK PARSE-HEALTH TABLE — the #1 operational metric of a
    * log-parsing pipeline: per event type, what share of payloads
    * each pattern tier actually parses. Three tiers of strictness
    * (any-int / two-digit / 70s-bucket) exercise `grok_match` as a
    * first-class surface, and the oracle re-expresses each tier as
    * the EXPANDED raw regex (q12's precedent) — so the row also
    * cross-engine-validates the grok compiler's macro expansion
    * against DuckDB's RE2. A collapsing match_bp is the "producer
    * changed their log format" alarm the reference's operators watch.
    *
    * Scale: one narrow projection (three codegen grok matches per
    * row), one low-cardinality aggregate with map-side combine.
    */
  /** The per-row tier indicators — shared by the batch query and the
    * streaming monitor's MV partials.
    */
  private[graft] def parseHealthIndicators(props: org.apache.spark.sql.Column)
      : Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "m_any" -> graft.functions.grok_match(props, """\{"k": %{INT:k}\}""").cast("long"),
    "m_2digit" -> graft.functions.grok_match(props, """\{"k": [1-9][0-9]\}""").cast("long"),
    "m_70s" -> graft.functions.grok_match(props, """\{"k": 7[0-9]\}""").cast("long"))

  /** The q265 rates as a pure function of the folded (event_type, n,
    * n_any, n_2digit, n_70s) count store — same code for batch and
    * the streaming monitor (`StreamingParseHealthSpec`: fold ==
    * rebuild exact).
    */
  private[graft] def parseHealthFromCounts(counts: DataFrame): DataFrame =
    counts.select(col("event_type"), col("n"),
        expr("n_any * 10000 div n").as("any_bp"),
        expr("n_2digit * 10000 div n").as("two_digit_bp"),
        expr("n_70s * 10000 div n").as("seventies_bp"))
      .orderBy("event_type")

  private val qParseHealth: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val inds = parseHealthIndicators(col("props"))
    parseHealthFromCounts(
      ev.select(col("event_type") +: inds.map { case (n, c) => c.as(n) }: _*)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("m_any").as("n_any"),
          sum("m_2digit").as("n_2digit"), sum("m_70s").as("n_70s")))
  }

  val all: Map[String, Q] = Map(
    "q265_parse_health" -> qParseHealth,
    "q1_agg" -> q1Agg,
    "q11_route" -> qRoute,
    "q12_grok" -> qGrok,
    "q13_enrich" -> qEnrich,
    "q36_enrich_origin" -> qEnrichOrigin,
    "q14_computed" -> qComputed,
    "q15_retention" -> qRetention
  ) ++ QueriesTraining.all ++ QueriesRelational.all ++ QueriesCuration.all ++
    QueriesAnalytics.all

  val oracles: Map[String, String] = QueriesTraining.oracles ++ QueriesRelational.oracles ++
    QueriesCuration.oracles ++ QueriesAnalytics.oracles ++ Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // parse health: each grok tier re-expressed as its expanded raw
    // regex (the q12 precedent) — cross-engine-validates the compiler
    "q265_parse_health" ->
      """WITH m AS (SELECT event_type,
        |  CAST(regexp_matches(props, '\{"k": (?:[+-]?(?:[0-9]+))\}') AS INT) AS m_any,
        |  CAST(regexp_matches(props, '\{"k": [1-9][0-9]\}') AS INT) AS m_2digit,
        |  CAST(regexp_matches(props, '\{"k": 7[0-9]\}') AS INT) AS m_70s
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(m_any) * 10000 // count(*) AS BIGINT) AS any_bp,
        |  CAST(sum(m_2digit) * 10000 // count(*) AS BIGINT) AS two_digit_bp,
        |  CAST(sum(m_70s) * 10000 // count(*) AS BIGINT) AS seventies_bp
        |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q12_grok" ->
      """SELECT event_id,
        |  coalesce(try_cast(regexp_extract(props, '\{"k": ([+-]?(?:[0-9]+))\}', 1) AS BIGINT), 0) AS k_val
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q11_route" ->
      """WITH routed AS (
        |  SELECT CASE
        |    WHEN user_id % 5 IN (0, 1, 2, 3) THEN NULL
        |    WHEN event_type = 'click' THEN 'gorouter'
        |    WHEN event_type = 'purchase' THEN 'gorouter'
        |    ELSE NULL END AS family
        |  FROM events)
        |SELECT coalesce(family, 'dropped') AS family, count(*) AS cnt
        |FROM routed GROUP BY 1 ORDER BY family""".stripMargin,

    "q13_enrich" ->
      """WITH apps AS (
        |  SELECT CAST(c_custkey AS VARCHAR) AS app_guid,
        |    c_name || CASE WHEN c_custkey % 4 = 2 THEN '-blue' ELSE '' END AS app_name,
        |    CAST(c_nationkey AS VARCHAR) AS space_guid
        |  FROM customer),
        |dims AS (
        |  SELECT a.app_guid, a.app_name,
        |    coalesce(n.n_name, '') AS space_name,
        |    coalesce(r.r_name, '') AS org_name
        |  FROM apps a
        |  LEFT JOIN nation n ON CAST(n.n_nationkey AS VARCHAR) = a.space_guid
        |  LEFT JOIN region r ON r.r_regionkey = n.n_regionkey),
        |logs AS (
        |  SELECT event_id,
        |    CASE WHEN user_id % 7 <> 0 THEN CAST(user_id AS VARCHAR)
        |         WHEN event_type <> 'error' THEN CAST(user_id * 3 AS VARCHAR)
        |         END AS key
        |  FROM events)
        |SELECT l.event_id,
        |  l.key AS cf_app_id,
        |  coalesce(d.app_name, '') AS cf_app,
        |  coalesce(d.space_name, '') AS cf_space,
        |  coalesce(d.org_name, '') AS cf_org
        |FROM logs l
        |LEFT JOIN dims d ON d.app_guid = l.key
        |WHERE l.key IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q36_enrich_origin" ->
      """WITH apps AS (
        |  SELECT CAST(c_custkey AS VARCHAR) AS app_guid,
        |    c_name || CASE WHEN c_custkey % 4 = 2 THEN '-blue' ELSE '' END AS app_name,
        |    CAST(c_nationkey AS VARCHAR) AS space_guid, c_nationkey
        |  FROM customer),
        |dims1 AS (
        |  SELECT a.app_guid, a.app_name,
        |    coalesce(n.n_name, '') AS space_name,
        |    coalesce(r.r_name, '') AS org_name
        |  FROM apps a
        |  LEFT JOIN nation n ON CAST(n.n_nationkey AS VARCHAR) = a.space_guid
        |  LEFT JOIN region r ON r.r_regionkey = n.n_regionkey),
        |dims AS (
        |  SELECT 'env1' AS origin, app_guid, app_name, space_name, org_name FROM dims1
        |  UNION ALL
        |  SELECT 'env2', app_guid, upper(app_name), space_name, org_name FROM dims1),
        |logs AS (
        |  SELECT event_id,
        |    'env' || CAST((user_id % 3) + 1 AS VARCHAR) AS origin,
        |    CASE WHEN user_id % 7 <> 0 THEN CAST(user_id AS VARCHAR)
        |         WHEN event_type <> 'error' THEN CAST(user_id * 3 AS VARCHAR)
        |         END AS key
        |  FROM events)
        |SELECT l.event_id, l.origin,
        |  CASE WHEN l.origin IN ('env1', 'env2') THEN l.key END AS cf_app_id,
        |  CASE WHEN l.origin IN ('env1', 'env2') THEN coalesce(d.app_name, '') END AS cf_app,
        |  CASE WHEN l.origin IN ('env1', 'env2') THEN coalesce(d.space_name, '') END AS cf_space,
        |  CASE WHEN l.origin IN ('env1', 'env2') THEN coalesce(d.org_name, '') END AS cf_org
        |FROM logs l
        |LEFT JOIN dims d ON d.origin = l.origin AND d.app_guid = l.key
        |WHERE l.key IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q14_computed" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms,
        |  strftime(ts, '%Y-%m-%d') AS dt,
        |  'gorouter-' || strftime(ts, '%Y-%m-%d') AS es_index
        |FROM events ORDER BY event_id""".stripMargin,

    "q15_retention" ->
      """WITH idx AS (
        |  SELECT 'gorouter-' || strftime(ts, '%Y-%m-%d') AS index_name, count(*) AS cnt
        |  FROM events GROUP BY 1
        |  UNION ALL SELECT '.kibana', 0
        |  UNION ALL SELECT 'undated_index', 0),
        |cut AS (
        |  SELECT coalesce(
        |    strftime(CAST(max(strftime(ts, '%Y-%m-%d')) AS DATE) - INTERVAL 2 DAY, '%Y-%m-%d'),
        |    '0000-00-00') AS cutoff
        |  FROM events)
        |SELECT index_name, cnt FROM idx, cut
        |WHERE index_name = '.kibana'
        |   OR (length(index_name) >= 10
        |       AND regexp_matches(right(index_name, 10), '^\d{4}-\d{2}-\d{2}$')
        |       AND right(index_name, 10) >= cutoff)
        |ORDER BY index_name""".stripMargin
  )
}

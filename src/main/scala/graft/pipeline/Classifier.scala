package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-way CASE classification / routing (SURVEY.md §2 row 4).
  *
  * First-match-wins rule chain, exactly the order of the reference's
  * `switch` (`/root/reference/main.go:366-412`): the four drop-routes
  * fire *before* the gorouter checks, so e.g. a record whose
  * source_instance contains `/var/vcap/sys/log/gorouter/access.log`
  * drops even when its tags say `source_id=gorouter`. Branches a–d are
  * dormant capability in the reference (commented-out grok parses +
  * index families) — they are modeled here with `active = false` and
  * can be resurrected by flipping the flag.
  */
object Classifier {

  /** One routing rule: predicate → (index family, grok pattern), or a
    * drop (family = None).
    */
  final case class RouteRule(
      name: String,
      family: Option[String],
      grokPattern: Option[String],
      active: Boolean)

  /** Rule chain in reference order. Inactive families record what the
    * dormant branches would route to (`main.go:368-391` comments).
    */
  val rules: Seq[RouteRule] = Seq(
    RouteRule("var_log_prefix", Some("linux_logs"), Some("%{GENERIC}"), active = false),
    RouteRule("gorouter_access_log", Some("gorouter_access"), Some("%{ROUTERACCESS}"), active = false),
    RouteRule("bosh_director", Some("bosh_director"), Some("%{GENERIC}"), active = false),
    RouteRule("var_vcap_sys_log_prefix", Some("var_vcap_sys_log"), Some("%{GENERIC}"), active = false),
    RouteRule("tag_gorouter", Some("gorouter"), Some("%{GENERIC}"), active = true),
    RouteRule("app_proc_web", Some("gorouter"), Some("%{GENERIC}"), active = true))

  /** Grok pattern per *active* index family. */
  val familyPatterns: Map[String, String] =
    rules.filter(r => r.active && r.family.isDefined)
      .map(r => r.family.get -> r.grokPattern.get).toMap

  /** Grok pattern per family including resurrected dormant routes. */
  val allFamilyPatterns: Map[String, String] =
    rules.filter(_.family.isDefined)
      .map(r => r.family.get -> r.grokPattern.get).toMap

  /** Index family for a record, null = drop (unroutable or drop-route).
    *
    * @param sourceInstance `log_message.source_instance`
    * @param tags           envelope `tags` map column
    * @param sourceType     `log_message.source_type`
    * @param includeDormant resurrect the reference's commented-out
    *   branches (`main.go:368-393`): the four drop-routes become real
    *   index families with their recorded grok patterns
    */
  def family(sourceInstance: Column, tags: Column, sourceType: Column,
             includeDormant: Boolean = false): Column = {
    val nullStr = lit(null).cast("string")
    def dormant(fam: String): Column = if (includeDormant) lit(fam) else nullStr
    when(sourceInstance.startsWith("/var/log/"), dormant("linux_logs"))
      .when(sourceInstance.contains("/var/vcap/sys/log/gorouter/access.log"),
        dormant("gorouter_access"))
      .when(sourceInstance.contains("/var/vcap/sys/log/director/"), dormant("bosh_director"))
      .when(sourceInstance.startsWith("/var/vcap/sys/log/"), dormant("var_vcap_sys_log"))
      .when(tags.getItem("source_id") === "gorouter", lit("gorouter"))
      .when(sourceType === "APP/PROC/WEB", lit("gorouter"))
      .otherwise(nullStr)
  }
}

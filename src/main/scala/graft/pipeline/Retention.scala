package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Retention / partition expiry (SURVEY.md §2 row 12).
  *
  * Mirrors `deleteOldIndices` (`/root/reference/main.go:214-254`)
  * including its quirks: `.kibana` always kept; an index is kept only
  * if its *last 10 chars* are a `\d{4}-\d{2}-\d{2}` date ≥ the cutoff
  * (string compare); everything else — including undated and
  * short-named indices — is dropped.
  */
object Retention {

  private val DateSuffixRe = """^\d{4}-\d{2}-\d{2}$""".r
  private val Fmt = DateTimeFormatter.ISO_LOCAL_DATE

  def cutoff(now: LocalDate, daysToKeep: Int): String =
    now.minusDays(daysToKeep.toLong).format(Fmt)

  /** The keep/drop rule, exactly `main.go:227-243`. */
  def shouldKeep(indexName: String, cutoff: String): Boolean = {
    if (indexName == ".kibana") return true
    if (indexName.length < cutoff.length) return false
    val suffix = indexName.substring(indexName.length - cutoff.length)
    DateSuffixRe.matches(suffix) && suffix >= cutoff
  }

  /** [[shouldKeep]] as a Column predicate (for set-oriented retention
    * over a partition listing); `cutoff` must be a yyyy-MM-dd literal.
    */
  def shouldKeepCol(indexName: org.apache.spark.sql.Column, cutoffDate: String): org.apache.spark.sql.Column =
    shouldKeepCol(indexName, org.apache.spark.sql.functions.lit(cutoffDate))

  /** Column-cutoff variant: the cutoff can itself be computed in-plan
    * (e.g. `max(date) − N days` cross-joined as a 1-row frame), keeping
    * the whole retention rule declarative — no driver-side collect.
    * The cutoff column must hold yyyy-MM-dd strings (length 10).
    */
  def shouldKeepCol(indexName: org.apache.spark.sql.Column,
      cutoffDate: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val n = 10 // yyyy-MM-dd
    val suffix = substring(indexName, -n, n)
    (indexName === ".kibana") ||
      (length(indexName) >= n &&
        suffix.rlike("""^\d{4}-\d{2}-\d{2}$""") &&
        suffix >= cutoffDate)
  }

  /** Sweeps a `partitionBy("es_index")` file sink: deletes every
    * `es_index=<name>` partition whose name fails [[shouldKeep]].
    * Returns (kept, dropped) partition names.
    */
  def sweep(spark: SparkSession, root: String, daysToKeep: Int,
      now: LocalDate = LocalDate.now()): (Seq[String], Seq[String]) = {
    val cut = cutoff(now, daysToKeep)
    val path = new Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return (Nil, Nil)
    val parts = fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("es_index="))
    val (keep, drop) = parts.partition(p => shouldKeep(p.getName.stripPrefix("es_index="), cut))
    // propagate delete failure like the reference's sweep (main.go:245-248)
    drop.foreach { p =>
      if (!fs.delete(p, true) && fs.exists(p))
        throw new java.io.IOException(s"retention sweep failed to delete $p")
    }
    (keep.map(_.getName.stripPrefix("es_index=")),
      drop.map(_.getName.stripPrefix("es_index=")))
  }
}

package graft.sources

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Paginated-fetch drain — the REST paginator shape the reference's
  * dimension warm uses (`caching_lazyfill.go:51-80, 161-190`:
  * `FillCache` walks the CF API's `next_url` pages until exhausted,
  * building the full app map in one process). The transport is
  * injected (`fetch(pageToken)` returns a page of rows plus the next
  * token, `None` = done), so the walk's semantics — token threading,
  * termination, page-limit runaway guard — are testable without HTTP,
  * and a deployment supplies the real client.
  *
  * Scale position: this loads DIMENSION-sized data (apps/spaces/orgs —
  * at most millions of rows) onto the driver, exactly like the
  * reference; the resulting frame is the broadcast side of the
  * enrichment join. Fact-sized data must come through a DSv2 source
  * (`ShardedRecordSource`), never a driver paginator.
  */
object PagedSource {

  /** Drains every page into one DataFrame. `maxPages` bounds a broken
    * paginator that re-serves tokens (the runaway-loop guard a
    * `next_url` walk needs); exceeding it throws rather than silently
    * truncating the dimension.
    */
  def loadAll[A <: Product : TypeTag](
      spark: SparkSession,
      fetch: Option[String] => (Seq[A], Option[String]),
      maxPages: Int = 10000): DataFrame = {
    val rows = Seq.newBuilder[A]
    var token: Option[String] = None
    var pages = 0
    var done = false
    while (!done) {
      if (pages >= maxPages)
        throw new IllegalStateException(
          s"paginator exceeded $maxPages pages — token loop? last token: $token")
      val (page, next) = fetch(token)
      rows ++= page
      pages += 1
      done = next.isEmpty
      token = next
    }
    import spark.implicits._
    spark.createDataset(rows.result()).toDF()
  }
}

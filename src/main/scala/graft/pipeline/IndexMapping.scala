package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

/** Index auto-create fidelity (SURVEY §2 row 13): the parquet sink
  * gets partition auto-create for free, but an ES-shaped sink adapter
  * must create each daily index with the reference's exact dynamic
  * mapping (`main.go:292-329`): `dynamic: true` +
  * `date_detection`/`numeric_detection` (the server-side typing the
  * reference delegates to, SURVEY §1.2), with only `timestamp`
  * explicitly typed `date`/`epoch_millis` (`main.go:312-317`).
  */
object IndexMapping {

  /** The create-index body (`main.go:306-320`), canonical field order. */
  val MappingJson: String =
    """{"mappings":{"_doc":{"date_detection":true,"numeric_detection":true,"dynamic":true,"properties":{"timestamp":{"type":"date","format":"epoch_millis"}}}}}"""

  /** Create-once memo, the `a.indices` map + mutex (`main.go:293-300,
    * 327`): `ensure` runs `create` exactly once per index name no
    * matter how many partitions/threads race on it. Driver- or
    * executor-local (like the reference's per-process memo — a second
    * JVM re-checks against the idempotent CreateIndex, which tolerates
    * already-exists).
    */
  final class Registry {
    private val indices = new ConcurrentHashMap[String, java.lang.Boolean]()

    /** Returns true iff this call performed the create. */
    def ensure(indexName: String)(create: String => Unit): Boolean = {
      var created = false
      indices.computeIfAbsent(indexName, { name =>
        create(name)
        created = true
        java.lang.Boolean.TRUE
      })
      created
    }

    def known: Set[String] = {
      import scala.jdk.CollectionConverters._
      indices.keySet().asScala.toSet
    }
  }
}

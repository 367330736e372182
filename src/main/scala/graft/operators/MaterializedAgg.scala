package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate materialized view.
  *
  * The 100 TB argument: a key-granular aggregate (events per
  * (event_type, day), revenue per (account, month), …) is rebuilt
  * daily in most pipelines by re-scanning the full history — O(corpus)
  * every day for a result that only changed where yesterday's delta
  * landed. With SUM-mergeable state the rebuild decomposes exactly:
  *
  *   MV(base ∪ delta) = combine(MV(base), MV(delta))
  *
  * so maintenance cost is O(delta) + O(|keys|): the full-granularity
  * shuffle touches ONLY delta rows (with map-side partial
  * aggregation), and the combine step unions two key-granular tables
  * — bounded by key cardinality, not corpus size.
  *
  * State is restricted to per-key BIGINT sums (counts are `sum(1)`,
  * averages are carried as sum+count pairs and divided at read time).
  * That restriction is the contract that makes `combine` a plain
  * re-sum; non-decomposable aggregates (exact distinct, medians) are
  * exactly what the repo's mergeable sketch UDAFs exist for — a KMV /
  * HLL / CMS column ([[graft.sketch]]) is itself SUM-like under its
  * own merge and slots into the same MV shape.
  *
  * Parallels the reference's periodic re-aggregation topology (daily
  * index rollover + full cache warm, `main.go:306-320`), re-expressed
  * as the incremental form a Spark warehouse would actually run.
  */
object MaterializedAgg {

  /** A view definition: grouping keys plus named per-ROW contribution
    * expressions; the MV stores `sum(contribution)` per key under each
    * name. All contributions must be BIGINT (enforced at build time —
    * double sums would make merge order observable).
    */
  final case class ViewDef(keys: Seq[String], partials: Seq[(String, Column)])

  private def requireLongs(mv: DataFrame, d: ViewDef): DataFrame = {
    import org.apache.spark.sql.types.LongType
    d.partials.foreach { case (n, _) =>
      val t = mv.schema(n).dataType
      require(t == LongType,
        s"MV column '$n' must be BIGINT (got $t): only exact integer " +
          "sums merge order-independently")
    }
    mv
  }

  /** Full build: one aggregation of `rows` at view granularity. */
  def build(rows: DataFrame, d: ViewDef): DataFrame = {
    val aggs = d.partials.map { case (n, c) => sum(c).as(n) }
    requireLongs(
      rows.groupBy(d.keys.map(col): _*).agg(aggs.head, aggs.tail: _*), d)
  }

  /** Merge a batch of new raw rows into an existing MV. The delta is
    * aggregated at view granularity first (its only corpus-sized
    * shuffle, map-side combined), then combined with the MV by
    * key-granular union + re-sum — `merge(mv, delta) ≡
    * build(base ∪ delta)` exactly, which is what the q103 oracle and
    * [[MaterializedAggSpec]] assert.
    */
  def merge(mv: DataFrame, deltaRows: DataFrame, d: ViewDef): DataFrame =
    combine(requireLongs(mv, d), build(deltaRows, d), d)

  /** Combine two key-granular MV states (the associative/commutative
    * monoid op — also the cross-partition / cross-day / cross-cluster
    * rollup). Missing keys on either side behave as zero.
    */
  def combine(a: DataFrame, b: DataFrame, d: ViewDef): DataFrame = {
    val aggs = d.partials.map { case (n, _) => sum(col(n)).as(n) }
    a.unionByName(b).groupBy(d.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

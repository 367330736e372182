package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q289's reason to exist, asserted as a property: the geometric
  * median is a ROBUST centroid. One planted outlier (a single poisoned
  * vector at 100× magnitude, 5% contamination) drags the arithmetic
  * mean by contamination × magnitude on its axis, while three
  * Weiszfeld rounds pull the median back inside the clean cluster —
  * driven through the registered q289 query on a doctored fixture, so
  * the property pins the battery code path, not a test re-derivation.
  */
class GeoMedianSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val Dims = 64

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_geomedian").toString
    // 19 inliers near e1 (unit axis 0) + 1 outlier at 100×e2 (axis 1);
    // all ids ≡ 0 (mod 4) so every row lands in q289's group 0
    val rows = (0 until 19).map { i =>
      val v = Array.fill(Dims)(0.0f)
      v(0) = 1.0f
      v(2) = i * 0.001f // deterministic jitter so points are distinct
      (i * 4L, v.toSeq)
    } :+ {
      val v = Array.fill(Dims)(0.0f)
      v(1) = 100.0f
      (19 * 4L, v.toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("one 5% outlier drags the mean ~5.0 on its axis; the median stays < 0.5") {
    val out = SparkEntry.queries("q289_geomedian")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    val (meanOutlierAxis, medOutlierAxis) = out((0L, 2L)) // pos is 1-based
    assert(math.abs(meanOutlierAxis - 5.0) < 1e-6, s"mean on poisoned axis: $meanOutlierAxis")
    assert(math.abs(medOutlierAxis) < 0.5, s"median on poisoned axis: $medOutlierAxis")
    val (meanClusterAxis, medClusterAxis) = out((0L, 1L))
    assert(math.abs(meanClusterAxis - 0.95) < 1e-6, s"mean on cluster axis: $meanClusterAxis")
    assert(medClusterAxis > 0.9, s"median on cluster axis: $medClusterAxis")
    // only group 0 is populated, one row per dimension
    assert(out.size == Dims && out.keys.forall(_._1 == 0L))
  }

  test("one Weiszfeld round shuffles only (grp, pos) partials — no corpus×dims exchange") {
    // round-13 (VERDICT r12 item 6): the old shape joined the exploded
    // corpus×dims table against the per-vector weight frame on
    // (grp, vec_id) — a corpus-×-dims shuffle per iteration. The
    // single-pass step's only exchanges may partition on (grp, pos)
    // (the groups×dims partial-sum aggregate and its tiny prev join);
    // nothing may hash-partition on vec_id, and no sort-merge join may
    // appear (the old join sorted both corpus-sized sides).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val e = graft.dedup.Dedup.materialize(
      spark.read.parquet(s"$dir/embeddings.parquet").select(
        (col("vec_id") % 4).as("grp"), col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")))
    val m = e.select(col("grp"), posexplode(col("v")).as(Seq("pos0", "x")))
      .select(col("grp"), (col("pos0") + 1).cast("long").as("pos"), col("x"))
      .groupBy("grp", "pos").agg(round(avg(col("x")), 6).as("m"))
    val step = QueriesTraining.geoMedianStep(e, m)
    step.queryExecution.toRdd.count()
    val plan = step.queryExecution.executedPlan
    val exchanges = plan.collectWithSubqueries { case s: ShuffleExchangeExec => s }
    exchanges.foreach { ex =>
      ex.outputPartitioning match {
        case h: HashPartitioning =>
          val keys = h.expressions.map(_.toString)
          assert(!keys.exists(_.contains("vec_id")),
            s"corpus-keyed exchange survived the single-pass rewrite: $ex")
        case _ => ()
      }
    }
    assert(plan.collectWithSubqueries { case j: SortMergeJoinExec => j }.isEmpty,
      s"sort-merge join in the Weiszfeld step:\n$plan")
  }
}

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
}

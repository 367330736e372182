package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Triangles

/** Degree-oriented triangle census vs brute force on random graphs
  * (sparse, dense, complete, skewed-star), and the out-degree bound
  * that makes the orientation the scalable shape.
  */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def bruteCensus(edges: Set[(Long, Long)]): (Long, Long, Long) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(n => n -> edges.count(e => e._1 == n || e._2 == n)).toMap
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val tris = (for {
      (a, b) <- edges.toSeq; (a2, c) <- edges.toSeq if a2 == a && b < c
      if edges.contains((b, c))
    } yield 1).size.toLong
    (edges.size.toLong, wedges, tris)
  }

  private def census(edges: Set[(Long, Long)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Triangles.audit(edges.toSeq.toDF("u", "v"), "u", "v").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("census equals brute force on random, complete, and star graphs") {
    val rnd = new scala.util.Random(98L)
    // random G(30, p) at several densities
    for (p <- Seq(0.05, 0.3, 0.8)) {
      val edges = (for {
        u <- 1L to 30L; v <- (u + 1) to 30L if rnd.nextDouble() < p
      } yield (u, v)).toSet
      val (ne, nw, nt) = bruteCensus(edges)
      assert(census(edges) === ((ne, nw, nt,
        if (nw > 0) 3 * nt * 10000 / nw else 0L)), s"p=$p")
    }
    // complete K8: C(8,3) triangles, closure exactly 10000 bp
    val k8 = (for (u <- 1L to 8L; v <- (u + 1) to 8L) yield (u, v)).toSet
    assert(census(k8) === ((28L, 168L, 56L, 10000L)))
    // star: hub of degree 20, zero triangles, wedges = C(20,2)
    val star = (2L to 21L).map(v => (1L, v)).toSet
    assert(census(star) === ((20L, 190L, 0L, 0L)))
  }

  test("orientation bounds the hub: star out-degree stays 1 per spoke") {
    import spark.implicits._
    // in a star the hub has max degree, so EVERY edge orients
    // spoke→hub: the wedge join sees out-degree ≤ 1 everywhere and
    // produces zero wedge candidates — the skew-immunity property
    val star = (2L to 41L).map(v => (1L, v))
    val e = star.toDF("u", "v")
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val outDeg = Triangles.orientedEdges(e, deg)
      .groupBy("src").agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).collect()(0).getLong(0)
    assert(outDeg === 1L, s"hub should never fan out, got out-degree $outDeg")
  }
}

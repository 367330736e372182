package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** The large-star/small-star experimental CC twin must agree with the
  * shipped LPA [[Dedup.connectedComponents]] on every graph shape that
  * distinguishes CC algorithms: paths (worst-case diameter — the shape
  * star contraction exists to kill), stars, cliques, disjoint mixes,
  * random graphs, and edgeless node sets. The rehearsal
  * (`ScaleRehearsal ccstars`) measures which one ships for q287;
  * correctness equivalence is pinned here either way.
  */
class CcStarsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def compare(nodeIds: Seq[Long], edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val nodes = nodeIds.toDF("id")
    val e = edges.toDF("a", "b")
    val lpa = Dedup.connectedComponents(nodes, e, "id", "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val stars = Dedup.connectedComponentsStars(nodes, e, "id", "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(stars == lpa)
  }

  test("path graph (worst-case diameter)") {
    compare(0L until 40L, (0L until 39L).map(i => (i, i + 1)))
  }

  test("star, clique, and two disjoint components") {
    compare(0L until 10L, (1L until 10L).map(i => (0L, i)))
    compare(0L until 8L,
      for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j))
    compare(0L until 20L,
      (0L until 9L).map(i => (i, i + 1)) ++ (10L until 19L).map(i => (i, i + 1)))
  }

  test("seeded random graphs, with isolated nodes and duplicate/reversed edges") {
    val rnd = new scala.util.Random(414L)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = (1 to 80).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val withDups = edges ++ edges.take(10).map(_.swap)
      compare(0L until n.toLong, withDups)
    }
  }

  test("edgeless node set: every node is its own component") {
    compare(0L until 7L, Seq.empty)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** The decontam TVF (q303, round-15 — VERDICT r14 item 6):
  * `decontam_banded(min_cos, recall_bp)` must be the q299 chain with
  * every knob derived in-SQL — row-identical at the shipped operating
  * point, loud on an impossible recall ask, loud past the enumerated
  * plane ceiling, and never a cartesian product.
  */
class SqlDecontamTvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  private def messagesOf(t: Throwable): String = {
    var cur: Throwable = t
    val sb = new StringBuilder
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("called at (tight threshold, 9000 bp) the TVF is row-identical to q299") {
    val tvf = QueriesTraining.sqlDecontamTvfCall(spark, dir,
        Similarity.DecontamTightCos, Similarity.DecontamRecallBp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val op = SparkEntry.queries("q299_decontam_tight")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(tvf.nonEmpty, "vacuous identity - the chain flagged nothing")
    // bit-exact: same md5-derived planes, same codegen dot/norm
    // kernels, same fold order, same argmax tie-break
    assert(tvf == op)
  }

  test("recall_bp outside (0, 10000) raises before ln(0) can wrap") {
    for (bad <- Seq(10000L, 0L, -5L)) {
      val ex = intercept[Throwable] {
        QueriesTraining.sqlDecontamTvfCall(spark, dir,
          Similarity.DecontamTightCos, bad).collect()
      }
      val msg = messagesOf(ex)
      assert(msg.contains("recall_bp") && msg.contains("100%"), msg)
    }
  }

  test("a derived plane family past the 4096 ceiling raises with a named cause") {
    // at this fixture (6 occupancy planes) a near-noise threshold with
    // a 99.99% target derives thousands of bands - the operating point
    // must fail loudly, never silently truncate the plane family
    val ex = intercept[Throwable] {
      QueriesTraining.sqlDecontamTvfCall(spark, dir, -0.5, 9999L).collect()
    }
    val msg = messagesOf(ex)
    assert(msg.contains("ceiling"), msg)
  }

  test("plan shape: the sign cross broadcasts, candidates are an equi-join, no cartesian product") {
    val df = QueriesTraining.sqlDecontamTvfCall(spark, dir,
      Similarity.DecontamTightCos, Similarity.DecontamRecallBp)
    df.queryExecution.toRdd.count(): Unit
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(40).mkString("\n"))
  }
}

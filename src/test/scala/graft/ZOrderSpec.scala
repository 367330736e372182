package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.layout.ZOrder

/** Bit-exactness of the Morton code (Scala and SQL twins) and the
  * physical layout contract of [[ZOrder.layout]] — the half q47's
  * rank-based oracle can't see (sampled range boundaries).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get("local[4]", "4")
  import spark.implicits._

  test("zValue: hand-interleaved bits") {
    // x=5 (101), y=3 (011), 3 bits: positions x->0,2,4 y->1,3,5
    // x bits 1,0,1 at 0/2/4 -> 1+0+16; y bits 1,1,0 at 1/3/5 -> 2+8+0; z=27
    val out = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].head()
    assert(out === 27L)
  }

  test("zValueSql is the bit-exact twin of zValue") {
    val df = spark.range(0, 2048).select(
      (col("id") % 64).as("a"), ((col("id") * 7 + 3) % 64).as("b"))
    val mismatches = df.select(
        ZOrder.zValue(Seq(col("a"), col("b")), 6).as("zs"),
        expr(ZOrder.zValueSql(Seq("a", "b"), 6)).as("zq"))
      .filter(col("zs") =!= col("zq")).count()
    assert(mismatches === 0L)
  }

  test("zValue locality: nearby points share high bits, distant ones don't") {
    val z = (a: Long, b: Long) => Seq((a, b)).toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), 10)).as[Long].head()
    assert((z(100L, 200L) ^ z(101L, 201L)) < (z(100L, 200L) ^ z(900L, 10L)))
  }

  test("layout: range-partitioned on z, sorted within partitions, disjoint ranges") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events").select(
      (col("user_id") % 1024).as("ub"),
      (floor(col("value")).cast("long") % 1024).as("vb"))
    val laid = ZOrder.layout(ev, Seq(col("ub"), col("vb")), 10, 8)
    val perPart = laid.select("__z").rdd.mapPartitionsWithIndex { (i, it) =>
      val zs = it.map(_.getLong(0)).toArray
      if (zs.isEmpty) Iterator.empty
      else Iterator((i, zs.head, zs.last, zs.sameElements(zs.sorted)))
    }.collect().sortBy(_._1)
    assert(perPart.nonEmpty && perPart.length <= 8)
    assert(perPart.forall(_._4), "each partition must be z-sorted")
    perPart.sliding(2).foreach {
      case Array((_, _, max1, _), (_, min2, _, _)) =>
        assert(max1 <= min2, "partition z-ranges must be disjoint and ordered")
      case _ =>
    }
  }
}

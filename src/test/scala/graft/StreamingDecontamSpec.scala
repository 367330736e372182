package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDecontam

/** The streaming decontamination gate must be a drop-in for the batch
  * sweep: the union of streamed verdicts equals q293's batch pass over
  * the same corpus (fold == rebuild — the verdict is a pure per-row
  * function of (row, eval set), so the spec pins the WIRING: splits,
  * threshold, routing, verdict columns), every input row lands in
  * exactly one store, a replayed batch republishes idempotently, and
  * an over-budget eval set is refused naming the banded path.
  */
class StreamingDecontamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  private def fixture() = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") % 10 =!= 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val eval = e.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("e_id"), col("embedding").as("e_vec"))
    (corpus, eval)
  }

  test("gate fold == batch sweep: routing, verdict columns, exactly-one-store") {
    val root = Files.createTempDirectory("graft_sdecontam").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val (corpus, eval) = fixture()

    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamingDecontam.startGate(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/ckpt", eval,
      s"$root/clean", s"$root/quarantine", trigger = Trigger.ProcessingTime(0))
    corpus.grouped(corpus.size / 3 + 1).foreach { chunk =>
      stream.addData(chunk.toSeq); q.processAllAvailable()
    }
    q.stop()

    val clean = spark.read.parquet(s"$root/clean")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quar = spark.read.parquet(s"$root/quarantine")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap

    // exactly one store per input row
    assert(clean.intersect(quar.keySet).isEmpty)
    assert(clean ++ quar.keySet == corpus.map(_._1).toSet)

    // fold == the batch sweep (q293's exact pass over the same corpus)
    val batch = QueriesTraining.embedDecontamExact(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(quar.keySet == batch.filter(_._2._3 == 1L).keySet)
    quar.foreach { case (vid, (nid, mc)) =>
      val (bNid, bMc, _) = batch(vid)
      assert(nid == bNid && mc == bMc, s"verdict drift for $vid")
    }
    assert(quar.nonEmpty, "fixture produced no contamination - vacuous spec")
  }

  test("replayed batch republishes its two dirs idempotently") {
    val root = Files.createTempDirectory("graft_sdecontam_rp").toString
    import spark.implicits._
    val (corpus, eval) = fixture()
    val evalCk = eval.localCheckpoint()
    val inc = corpus.take(40).toDF("vec_id", "vec")
    StreamingDecontam.gateBatch(inc, 5L, evalCk, s"$root/clean",
      s"$root/quarantine", graft.sim.Similarity.NearDupCos)
    def counts() = (
      spark.read.parquet(s"$root/clean/batch=5").count(),
      spark.read.parquet(s"$root/quarantine/batch=5").count())
    val first = counts()
    assert(first._1 + first._2 == 40L)
    StreamingDecontam.gateBatch(inc, 5L, evalCk, s"$root/clean",
      s"$root/quarantine", graft.sim.Similarity.NearDupCos)
    assert(counts() == first, "replay changed the published batch")
  }

  test("eval generations + incremental rescreen: a new gen catches a leak the old gen missed, replay-safe") {
    // round-15 (VERDICT r14 item 2): the benchmark suite GROWS after
    // the gate has committed clean rows — the new eval item is a
    // verbatim copy of a committed-clean vector (cos 1.0, the leak the
    // gen-0 screen could not see). rescreenClean must move exactly the
    // newly-flagged rows clean -> quarantine, advance the watermark,
    // and be idempotent under replay.
    val root = Files.createTempDirectory("graft_sdecontam_gen").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val (corpus, eval) = fixture()
    val cleanP = s"$root/clean"
    val quarP = s"$root/quarantine"

    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamingDecontam.startGate(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/ckpt", eval,
      cleanP, quarP, trigger = Trigger.ProcessingTime(0), managedEval = true)
    corpus.grouped(corpus.size / 3 + 1).foreach { chunk =>
      stream.addData(chunk.toSeq); q.processAllAvailable()
    }
    q.stop()
    assert(StreamingDecontam.currentEvalGen(spark, cleanP).contains(0L))
    assert(StreamingDecontam.screenedGen(spark, cleanP) == 0L)

    val cleanBefore = spark.read.parquet(cleanP)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val quarBefore = spark.read.parquet(quarP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cleanBefore.nonEmpty)
    // the planted leak: a NEW eval item identical to a committed-clean
    // vector; the expected moved set = every clean row within the gate
    // threshold of it (computed with the same shared kernel the gate
    // and the batch sweep use — this spec pins WIRING, q293's oracle
    // pins the kernel's math)
    val targetId = cleanBefore.keySet.min
    val gen1 = eval.unionAll(
      Seq((999999L, cleanBefore(targetId))).toDF("e_id", "e_vec"))
    StreamingDecontam.publishEval(spark, cleanP, 1L, gen1)
    assert(StreamingDecontam.currentEvalGen(spark, cleanP).contains(1L))
    val delta = Seq((999999L, cleanBefore(targetId))).toDF("e_id", "e_vec")
    val expectMoved = graft.sim.Similarity.evalVerdicts(
        cleanBefore.toSeq.toDF("vec_id", "vec"), delta,
        graft.sim.Similarity.NearDupCos)
      .filter(col("flagged") === 1L).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(expectMoved.contains(targetId), "planted leak not even self-flagged")

    val stats = StreamingDecontam.rescreenClean(spark, cleanP, quarP)
    assert(stats.contains(StreamingDecontam.RescreenStats(0L, 1L, 1L,
      expectMoved.size.toLong)), stats)
    assert(StreamingDecontam.screenedGen(spark, cleanP) == 1L)

    val cleanAfter = spark.read.parquet(cleanP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quarAfter = spark.read.parquet(quarP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cleanAfter == cleanBefore.keySet -- expectMoved)
    assert(quarAfter == quarBefore ++ expectMoved)
    // the moved rows carry the verdict columns and live under the
    // rescreen batch id space
    val movedRows = spark.read.parquet(
      s"$quarP/batch=${StreamingDecontam.RescreenBatchBase + 1L}")
    assert(movedRows.columns.toSeq == Seq("vec_id", "vec", "near_eval_id", "max_cos"))
    assert(movedRows.select("vec_id").collect().map(_.getLong(0)).toSet == expectMoved)
    assert(movedRows.filter(col("near_eval_id") === 999999L).count() == expectMoved.size)

    // replay: the store is already at gen 1 -> no-op, nothing changes
    assert(StreamingDecontam.rescreenClean(spark, cleanP, quarP).isEmpty)
    assert(spark.read.parquet(cleanP).count() == cleanAfter.size)
    assert(spark.read.parquet(quarP).select("vec_id").distinct().count()
      == quarAfter.size)

    // a crashed run's completed quarantine dir is never clobbered by
    // the rerun: publish gen 2 adding another planted leak, pre-create
    // the gen-2 rescreen output as a finished prior attempt, then
    // rescreen — the existing dir wins and the clean side still drops
    // the row
    val target2 = cleanAfter.min
    val vec2 = cleanBefore(target2)
    StreamingDecontam.publishEval(spark, cleanP, 2L,
      gen1.unionAll(Seq((999998L, vec2)).toDF("e_id", "e_vec")))
    val expect2 = graft.sim.Similarity.evalVerdicts(
        cleanAfter.toSeq.map(id => id -> cleanBefore(id)).toDF("vec_id", "vec"),
        Seq((999998L, vec2)).toDF("e_id", "e_vec"),
        graft.sim.Similarity.NearDupCos)
      .filter(col("flagged") === 1L).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val stats2 = StreamingDecontam.rescreenClean(spark, cleanP, quarP)
    assert(stats2.contains(StreamingDecontam.RescreenStats(1L, 2L, 1L,
      expect2.size.toLong)), stats2)
    val cleanFinal = spark.read.parquet(cleanP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cleanFinal == cleanAfter -- expect2)
    // every corpus row still lands in exactly one store
    val quarFinal = spark.read.parquet(quarP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cleanFinal.intersect(quarFinal).isEmpty)
    assert(cleanFinal ++ quarFinal == corpus.map(_._1).toSet)
  }

  test("projected verdict kernel == the broadcast-join shape, bit-exact") {
    // round-15: evalVerdicts is projection-shaped below the task-literal
    // ceiling (vec_argmax_cos + element_at + one vec_cosine recompute);
    // the cross-join + max_by shape remains past it. The two must agree
    // on ids AND doubles (the recomputed winning cosine shares the
    // VectorCosine fold, so bit-equality is by construction - pinned).
    import spark.implicits._
    val (corpus, eval) = fixture()
    val corpusDf = corpus.toSeq.toDF("vec_id", "vec")
    val evalCk = eval.localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    val projected = rows(graft.sim.Similarity.evalVerdicts(
      corpusDf, evalCk, graft.sim.Similarity.NearDupCos))
    val joined = rows(graft.sim.Similarity.evalVerdictsJoined(
      corpusDf, evalCk, graft.sim.Similarity.NearDupCos))
    assert(projected.nonEmpty && projected == joined)
  }

  test("empty eval frame is refused - the router contract forbids a silent row sink") {
    // ADVICE r14: with zero eval rows the verdict cross-join produces
    // zero groups, so every increment would vanish from BOTH stores —
    // the gate must refuse at start, not drop rows forever.
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("e_id", "e_vec")
    val ex = intercept[IllegalArgumentException] {
      StreamingDecontam.startGate(
        spark.readStream.format("rate").load()
          .select(col("value").as("vec_id"), array(lit(0.0f)).as("embedding")),
        "/tmp/never_e", empty, "/tmp/never_e2", "/tmp/never_e3")
    }
    assert(ex.getMessage.contains("EMPTY"), ex.getMessage)
    assert(ex.getMessage.contains("neither"), ex.getMessage)
  }

  test("over-budget eval set is refused, naming the banded path") {
    import spark.implicits._
    val (_, eval) = fixture()
    val ex = intercept[IllegalArgumentException] {
      StreamingDecontam.startGate(
        spark.readStream.format("rate").load()
          .select(col("value").as("vec_id"), array(lit(0.0f)).as("embedding")),
        "/tmp/never", eval, "/tmp/never2", "/tmp/never3",
        dims = Int.MaxValue / 4) // force the footprint past any budget
    }
    assert(ex.getMessage.contains("q297"), ex.getMessage)
    assert(ex.getMessage.contains("broadcast"), ex.getMessage)
  }
}

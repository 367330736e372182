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
    assert(stats.map(s => (s.fromGen, s.toGen, s.evalDeltaRows, s.moved))
      .contains((0L, 1L, 1L, expectMoved.size.toLong)), stats)
    // round-16: the rewrite touched only the dirs holding flagged rows
    assert(stats.exists(s => s.dirsRewritten <= s.dirsTotal && s.dirsRewritten > 0L), stats)
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
    assert(stats2.map(s => (s.fromGen, s.toGen, s.evalDeltaRows, s.moved))
      .contains((1L, 2L, 1L, expect2.size.toLong)), stats2)
    val cleanFinal = spark.read.parquet(cleanP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cleanFinal == cleanAfter -- expect2)
    // every corpus row still lands in exactly one store
    val quarFinal = spark.read.parquet(quarP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cleanFinal.intersect(quarFinal).isEmpty)
    assert(cleanFinal ++ quarFinal == corpus.map(_._1).toSet)
  }

  test("selective rescreen (VERDICT r15 item 1): only the flagged dir rewrites, the others stay byte-identical") {
    // 4 gate batch dirs at the TIGHT threshold (the fixture has no
    // tight pairs, so every row lands clean); a verbatim-copy plant
    // catches exactly its source row, which lives in exactly ONE dir —
    // the other 3 dirs' files must remain byte-for-byte untouched
    // (path set, length, mtime), the r15 full-store republish bill
    // made ∝ affected dirs.
    val root = Files.createTempDirectory("graft_sdecontam_sel").toString
    import spark.implicits._
    val (corpus, eval) = fixture()
    val evalCk = eval.localCheckpoint()
    val cleanP = s"$root/clean"
    val quarP = s"$root/quarantine"
    val tight = graft.sim.Similarity.DecontamTightCos
    (0L until 4L).foreach { b =>
      val inc = corpus.filter(_._1 % 4 == b).toDF("vec_id", "vec")
      StreamingDecontam.gateBatch(inc, b, evalCk, cleanP, quarP, tight)
    }
    StreamingDecontam.ensureEval(spark, cleanP, evalCk)
    assert(spark.read.parquet(cleanP).count() == corpus.size.toLong,
      "tight gate should flag nothing on this fixture")

    def inventory(skipDot: Boolean = true): Map[String, (Long, Long)] = {
      val hfs = new org.apache.hadoop.fs.Path(cleanP)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = hfs.listFiles(new org.apache.hadoop.fs.Path(cleanP), true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        val rel = f.getPath.toString.stripPrefix(s"file:$cleanP/")
        if (!skipDot || !rel.startsWith(".")) b += rel -> (f.getLen, f.getModificationTime)
      }
      b.result()
    }
    val before = inventory()

    val target = corpus.find(_._1 % 4 == 2L).get // lives in batch=2
    StreamingDecontam.publishEval(spark, cleanP, 1L,
      evalCk.unionAll(Seq((4000000000L, target._2)).toDF("e_id", "e_vec")))
    val stats = StreamingDecontam.rescreenClean(spark, cleanP, quarP, minCos = tight)
    assert(stats.exists(s => s.moved == 1L && s.dirsRewritten == 1L &&
      s.dirsTotal == 4L && s.bytesRewritten > 0L), stats)

    val after = inventory()
    def outside(m: Map[String, (Long, Long)]) = m.filterNot(_._1.startsWith("batch=2/"))
    assert(outside(before) == outside(after),
      "files outside the affected dir must be byte/mtime-identical")
    assert(before.keySet.filter(_.startsWith("batch=2/")) !=
      after.keySet.filter(_.startsWith("batch=2/")),
      "the affected dir must have been republished")
    // and the row really moved
    assert(!spark.read.parquet(cleanP).select("vec_id")
      .collect().map(_.getLong(0)).contains(target._1))
    assert(spark.read.parquet(
        s"$quarP/batch=${StreamingDecontam.RescreenBatchBase + 1L}")
      .select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(target._1))
  }

  test("unparsable .screened-gen watermark reads as gen 0; rescreen stays conservative (ADVICE r15)") {
    val root = Files.createTempDirectory("graft_sdecontam_wm").toString
    import spark.implicits._
    val (corpus, eval) = fixture()
    val evalCk = eval.localCheckpoint()
    val cleanP = s"$root/clean"
    val quarP = s"$root/quarantine"
    val tight = graft.sim.Similarity.DecontamTightCos
    StreamingDecontam.gateBatch(corpus.take(60).toDF("vec_id", "vec"),
      0L, evalCk, cleanP, quarP, tight)
    StreamingDecontam.ensureEval(spark, cleanP, evalCk)
    // a crash mid-write used to leave a truncated marker whose
    // .toLong wedged every later rescreen — forge one
    val hfs = new org.apache.hadoop.fs.Path(cleanP)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(cleanP, ".screened-gen")
    val out = hfs.create(m, true)
    out.write("garb".getBytes("UTF-8")); out.close()
    assert(StreamingDecontam.screenedGen(spark, cleanP) == 0L)
    val target = corpus.take(60).head
    StreamingDecontam.publishEval(spark, cleanP, 1L,
      evalCk.unionAll(Seq((4000000001L, target._2)).toDF("e_id", "e_vec")))
    val stats = StreamingDecontam.rescreenClean(spark, cleanP, quarP, minCos = tight)
    assert(stats.exists(s => s.fromGen == 0L && s.toGen == 1L && s.moved == 1L), stats)
    assert(StreamingDecontam.screenedGen(spark, cleanP) == 1L)
  }

  test("store seeded at gen >= 1 rescreens against the full set instead of a path error (ADVICE r15)") {
    val root = Files.createTempDirectory("graft_sdecontam_seed").toString
    import spark.implicits._
    val (corpus, eval) = fixture()
    val evalCk = eval.localCheckpoint()
    val cleanP = s"$root/clean"
    val quarP = s"$root/quarantine"
    val tight = graft.sim.Similarity.DecontamTightCos
    StreamingDecontam.gateBatch(corpus.take(60).toDF("vec_id", "vec"),
      0L, evalCk, cleanP, quarP, tight)
    val target = corpus.take(60).head
    // seed DIRECTLY at generation 3 — no gen-0 dir, no watermark
    StreamingDecontam.publishEval(spark, cleanP, 3L,
      evalCk.unionAll(Seq((4000000002L, target._2)).toDF("e_id", "e_vec")))
    val evalRows = evalCk.count() + 1L
    val stats = StreamingDecontam.rescreenClean(spark, cleanP, quarP, minCos = tight)
    // the fallback screens against the FULL gen-3 set (delta = all)
    assert(stats.exists(s => s.fromGen == 0L && s.toGen == 3L &&
      s.evalDeltaRows == evalRows && s.moved == 1L), stats)
  }

  test("managed gate caches the eval frame by generation (VERDICT r15 item 4)") {
    val root = Files.createTempDirectory("graft_sdecontam_cache").toString
    import spark.implicits._
    val (_, eval) = fixture()
    val evalCk = eval.localCheckpoint()
    val cleanP = s"$root/clean"
    StreamingDecontam.ensureEval(spark, cleanP, evalCk)
    val cache = new StreamingDecontam.ManagedEvalCache(cleanP)
    (1 to 3).foreach(_ => assert(cache.current(spark).isDefined))
    assert(cache.reads.get() == 1L,
      "three batches at an unchanged generation must read the eval parquet once")
    StreamingDecontam.publishEval(spark, cleanP, 1L,
      evalCk.unionAll(Seq((4000000003L, Seq.fill(64)(0.1f).toSeq)).toDF("e_id", "e_vec")))
    val ev1 = cache.current(spark)
    assert(cache.reads.get() == 2L, "a mid-stream publish must trigger exactly one re-read")
    assert(ev1.get.count() == evalCk.count() + 1L)
    cache.current(spark)
    assert(cache.reads.get() == 2L)
  }

  test("rescreen crash windows: a marker rolls forward, staging without a marker rolls back") {
    val root = Files.createTempDirectory("graft_sdecontam_crash").toString
    import spark.implicits._
    val (corpus, eval) = fixture()
    val evalCk = eval.localCheckpoint()
    val cleanP = s"$root/clean"
    val quarP = s"$root/quarantine"
    val tight = graft.sim.Similarity.DecontamTightCos
    (0L until 2L).foreach { b =>
      StreamingDecontam.gateBatch(
        corpus.filter(_._1 % 2 == b).toDF("vec_id", "vec"),
        b, evalCk, cleanP, quarP, tight)
    }
    val hfs = new org.apache.hadoop.fs.Path(cleanP)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b0 = spark.read.parquet(s"$cleanP/batch=0")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // forge a crashed run: staged replacement for batch=0 missing one
    // row, marker present -> recovery must publish it and leave batch=1
    // alone
    b0.tail.toDF("vec_id", "vec").write.mode("overwrite")
      .parquet(s"$cleanP/.rescreen-clean-staging/batch=0")
    val marker = new org.apache.hadoop.fs.Path(cleanP, ".rescreen-commit")
    val out = hfs.create(marker, true)
    out.write("9\n0".getBytes("UTF-8")); out.close()
    val b1Before = spark.read.parquet(s"$cleanP/batch=1").count()
    StreamingDecontam.recoverRescreen(spark, cleanP)
    assert(spark.read.parquet(s"$cleanP/batch=0").count() == b0.size - 1L)
    assert(spark.read.parquet(s"$cleanP/batch=1").count() == b1Before)
    assert(!hfs.exists(marker))
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(cleanP, ".rescreen-clean-staging")))
    assert(!hfs.listStatus(new org.apache.hadoop.fs.Path(cleanP))
      .exists(_.getPath.getName.startsWith(".rescreen-retired-")))
    // pre-marker crash: staging litter with NO marker rolls back
    b0.toDF("vec_id", "vec").write.mode("overwrite")
      .parquet(s"$cleanP/.rescreen-clean-staging/batch=1")
    StreamingDecontam.recoverRescreen(spark, cleanP)
    assert(spark.read.parquet(s"$cleanP/batch=1").count() == b1Before,
      "a pre-marker crash must leave the store untouched")
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(cleanP, ".rescreen-clean-staging")))
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

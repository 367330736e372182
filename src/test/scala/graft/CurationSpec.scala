package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.Curation

/** Unit properties of the curation operators (the oracle battery
  * q37–q40 checks end-to-end numbers; these pin the semantics and the
  * plan shapes).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get("local[4]", "4")
  import spark.implicits._

  test("decontaminate: overlapping doc flagged, disjoint doc kept with overlap 0") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // shares 5-gram run
      (2L, "totally different words nothing shared here at all")
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, eval_, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out(1L)._1 === 5L) // trigrams of the shared 7-token prefix
    assert(out(1L)._2 === 1)
    assert(out(2L) === ((0L, 0)))
  }

  test("decontaminate: eval side broadcasts; no sort-merge join") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val df = Curation.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", 5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), s"eval set must broadcast:\n$p")
  }

  test("decontaminateBloom: bit-identical to the exact path") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 97 === 0)
    val exact = Curation.decontaminate(corpus, eval_, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    val bloom = Curation.decontaminateBloom(corpus, eval_, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(bloom.toSeq === exact.toSeq)
  }

  test("decontaminateBloom: codegen bloom prune sits in the plan BELOW the exact join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val df = Curation.decontaminateBloom(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", 5)
    val lp = df.queryExecution.optimizedPlan
    val bloomFilters = lp.collect {
      case f @ Filter(cond, _) if cond.toString.contains("might_contain") => f
    }
    // the predicate must survive optimization as a Filter...
    assert(bloomFilters.nonEmpty, s"bloom prune missing from plan:\n$lp")
    // ...and sit on the SCAN side of every join (no join among its
    // descendants) — a prune that migrated above the exact join would
    // defeat the composition's whole point (pre-shuffle reduction)
    assert(bloomFilters.forall(f => f.collect { case j: Join => j }.isEmpty),
      s"bloom prune sits above a join:\n$lp")
    assert(lp.collect { case j: Join => j }.nonEmpty, "exact verify join vanished")
  }

  test("scrubPii: all three kinds redacted; counts on original text") {
    val df = Seq(
      ("a", "mail bob.smith+x@corp.example.org and 10.1.2.3 then 12345678901"),
      ("b", "no pii here"),
      ("c", "short 1234567 is kept, 999.999.999.999 still shaped like an ip")
    ).toDF("id", "t").select(col("id"),
      Curation.scrubPii(col("t")).as("clean"),
      Curation.countMatches(col("t"), Curation.EmailRe).as("ne"),
      Curation.countMatches(col("t"), Curation.Ipv4Re).as("ni"),
      Curation.countMatches(col("t"), Curation.LongNumRe).as("nn"))
    val m = df.collect().map(r => r.getString(0) ->
      ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(m("a") === (("mail <EMAIL> and <IP> then <NUM>", 1, 1, 1)))
    assert(m("b") === (("no pii here", 0, 0, 0)))
    // 7 digits: below the run threshold; 999.* is dotted-quad SHAPED
    // (scrubber is format-, not validity-, aware — documented)
    assert(m("c") === (("short 1234567 is kept, <IP> still shaped like an ip", 0, 1, 0)))
  }

  test("packSequences: offsets are per-shard exclusive prefix sums; bins respect budget") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = Curation.packSequences(docs, "doc_id", "text", 512, 4)
      .select("doc_id", "tok_count", "shard", "offset", "bin").collect()
    assert(out.nonEmpty)
    val byShard = out.groupBy(_.getLong(2))
    assert(byShard.size > 1, "expected docs spread over multiple shards")
    byShard.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(0))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) === expect, s"offset mismatch at doc ${r.getLong(0)}")
        assert(r.getLong(4) === r.getLong(3) / 512)
        expect += r.getLong(1)
      }
    }
  }

  test("scrubPii is idempotent: scrubbing scrubbed text changes nothing") {
    val texts = Seq(
      "mail a@b.co and 10.1.2.3 and 123456789",
      "<EMAIL> already scrubbed <IP> <NUM>",
      "partial quads 1.2.3.4.5.6 and long 99999999999999999999",
      "empty", "", "unicode ünïcödé@exämple.com stays ascii-gated")
    val df = texts.toDF("t")
      .select(col("t"), Curation.scrubPii(col("t")).as("once"))
      .select(col("once"), Curation.scrubPii(col("once")).as("twice"))
    df.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("stratifiedKeep monotone in rate: keep set at 3000bp is a subset of 7000bp") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    def kept(bp: Int) = docs
      .filter(Curation.stratifiedKeep(col("doc_id"), col("lang"), Map("en" -> bp), 10000))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lo = kept(3000)
    val hi = kept(7000)
    assert(lo.subsetOf(hi))
    assert(lo.size < hi.size)
  }

  test("stratifiedKeep: deterministic, and rates land near the target basis points") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val keep = Curation.stratifiedKeep(col("doc_id"), col("lang"),
      Map("en" -> 3000), 10000)
    val a = docs.filter(keep).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = docs.filter(keep).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b) // reproducible
    val en = docs.filter(col("lang") === "en")
    val frac = en.filter(keep).count().toDouble / en.count()
    assert(frac > 0.2 && frac < 0.4, s"en keep-rate $frac far from 0.30")
    // non-en strata untouched at rate 10000
    val other = docs.filter(col("lang") =!= "en")
    assert(other.filter(keep).count() === other.count())
  }

  test("repetitionMetrics: hand-computed ratios for degenerate and clean docs") {
    val docs = Seq(
      (1L, "a a a a"),     // 4 toks, 1 distinct; bigram 'a a' x3; trigram 'a a a' x2
      (2L, "w x y z"),     // all distinct, no repeated n-grams
      (3L, "solo")         // single token: no bigrams/trigrams at all
    ).toDF("doc_id", "text")
    val out = Curation.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getInt(5)))).toMap
    assert(out(1L) === ((4L, 0.25, 1.0, 1.0, 1)))
    assert(out(2L) === ((4L, 1.0, 0.333333, 0.0, 1))) // top bigram 1/3 trips the frac rule
    assert(out(3L) === ((1L, 1.0, 0.0, 0.0, 0)))
  }

  test("blockDedupStats: first occurrence by (doc id, position) wins; later copies drop") {
    val eight = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (1L, eight),                               // original block
      (2L, s"$eight c1 c2 c3 c4 c5 c6 c7 c8"),   // dup block + fresh block
      (3L, s"c1 c2 c3 c4 c5 c6 c7 c8 tail")      // dup of doc2's 2nd block + short tail
    ).toDF("doc_id", "text")
    val out = Curation.blockDedupStats(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((1L, 1L, 1.0)))
    assert(out(2L) === ((2L, 1L, 0.5)))  // its copy of doc1's block drops
    assert(out(3L) === ((2L, 1L, 0.5)))  // 'tail' block is unique and survives
  }

  test("blockDedupStats: null-text docs produce zero blocks, not phantom rows") {
    val docs = Seq((1L, Some("w1 w2 w3 w4 w5 w6 w7 w8")), (2L, None))
      .toDF("doc_id", "text")
    val out = Curation.blockDedupStats(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L)) // doc 2 absent, matching the oracle's semantics
  }

  test("temperatureRates: sqrt weights upweight the small stratum, bp exact") {
    val docs = (1 to 100).map(i => (i.toLong, "A")) ++ (1 to 400).map(i => (i + 1000L, "B"))
    val df = docs.toDF("doc_id", "source")
    val rates = Curation.temperatureRates(df, "source", 5000)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // target = 250; w_A = sqrt(1e8) = 10000, w_B = sqrt(4e8) = 20000
    // p_A = 250*10000/30000/100 = 0.8333..; p_B = 250*20000/30000/400 = 0.41666..
    assert(rates("A") === ((100L, 10000L, 8333L)))
    assert(rates("B") === ((400L, 20000L, 4166L)))
    // the small stratum keeps 2x the rate of the large one: temperature flattening
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.BulkRetry
import graft.pipeline.BulkRetry.{Doc, ItemResult}

/** Bulk-sink retry/backoff semantics (reference
  * `vendor/gopkg.in/olivere/elastic.v5/bulk_processor.go:21,64-67`):
  * per-item retry on 408/429/503/507, 200ms→10s exponential backoff,
  * non-retryable non-2xx fails the item (never the batch), and — the
  * round-4 advice items — every input item is accounted for even when
  * the sender misbehaves (short result list, thrown transport error).
  */
class BulkRetrySpec extends AnyFunSuite {

  private def noSleep: Long => Unit = _ => ()

  test("backoff doubles from 200ms and caps at 10s") {
    assert(BulkRetry.backoffMs(0) === 200L)
    assert(BulkRetry.backoffMs(1) === 400L)
    assert(BulkRetry.backoffMs(5) === 6400L)
    assert(BulkRetry.backoffMs(6) === 10000L)
    assert(BulkRetry.backoffMs(30) === 10000L)
  }

  test("a lazy Seq from send does not defeat strict accounting") {
    // a LazyList is a Seq whose filter side effects run on demand; the
    // accounting must force it before sweeping the unacked remainder,
    // or every acked item double-counts as failed(0) AND succeeded
    val rep = BulkRetry.flush(Seq("a", "b", "c"), sleep = noSleep) { items =>
      items.to(LazyList).map(ItemResult(_, 200))
    }
    assert(rep.succeeded === 3L)
    assert(rep.failed.isEmpty)
  }

  test("retryable items are resubmitted per-item; others succeed once") {
    var rounds = Vector.empty[Seq[String]]
    val rep = BulkRetry.flush(Seq("a", "b", "c"), sleep = noSleep) { items =>
      rounds :+= items
      items.map {
        case "b" if rounds.size == 1 => ItemResult("b", 429)
        case x                       => ItemResult(x, 200)
      }
    }
    assert(rounds === Vector(Seq("a", "b", "c"), Seq("b")))
    assert(rep.succeeded === 3L)
    assert(rep.failed.isEmpty)
  }

  test("non-retryable status fails the item immediately, not the batch") {
    val rep = BulkRetry.flush(Seq("a", "bad"), sleep = noSleep) { items =>
      items.map(x => ItemResult(x, if (x == "bad") 400 else 201))
    }
    assert(rep.succeeded === 1L)
    assert(rep.failed === Seq(ItemResult("bad", 400)))
  }

  test("retries exhaust after maxRetries rounds and the item fails with last status") {
    var sleeps = Vector.empty[Long]
    val rep = BulkRetry.flush(Seq("x"), maxRetries = 2, sleep = sleeps :+= _) { items =>
      items.map(ItemResult(_, 503))
    }
    // round 0 (send) → backoff(0) → round 1 → backoff(1) → round 2: exhausted
    assert(sleeps === Vector(200L, 400L))
    assert(rep.succeeded === 0L)
    assert(rep.failed === Seq(ItemResult("x", 503)))
  }

  test("sender returning fewer results than items: missing items land in failed, not limbo") {
    // "b" appears twice; sender acknowledges only one copy plus "a".
    val rep = BulkRetry.flush(Seq("a", "b", "b"), sleep = noSleep) { items =>
      Seq(ItemResult("a", 200), ItemResult("b", 200))
    }
    assert(rep.succeeded === 2L)
    assert(rep.failed === Seq(ItemResult("b", 0)))
    assert(rep.succeeded + rep.failed.size === 3L) // every input accounted
  }

  test("right COUNT but wrong results: duplicate/foreign acks discarded, real item failed") {
    // sender acks "a" twice and a foreign "c" — sizes match (3==3) but
    // "b" was never acknowledged and "c" was never submitted
    val rep = BulkRetry.flush(Seq("a", "b", "b"), sleep = noSleep) { _ =>
      Seq(ItemResult("a", 200), ItemResult("a", 200), ItemResult("c", 429))
    }
    assert(rep.succeeded === 1L)           // one real "a"
    assert(rep.failed.toSet === Set(ItemResult("b", 0))) // both "b" occurrences
    assert(rep.failed.size === 2)
    assert(rep.succeeded + rep.failed.size === 3L) // every input accounted
  }

  test("writeBulk: thrown transport errors ride the backoff path, then succeed") {
    val spark = GraftSession.get("local[2]", "2")
    import spark.implicits._
    val docs = Seq(("idx-2024-01-01", "d1", "{}"), ("idx-2024-01-01", "d2", "{}"))
      .toDF("es_index", "doc_id", "doc")
    // first call per partition throws (connection refused); retry succeeds.
    // static so it survives serialization to executor threads.
    BulkRetrySpec.flaky.set(true)
    val (sent, lost) = BulkRetry.writeBulk(docs.repartition(1), maxRetries = 3) { items =>
      if (BulkRetrySpec.flaky.getAndSet(false)) throw new java.io.IOException("connection refused")
      items.map(ItemResult(_, 200))
    }
    assert(sent === 2L)
    assert(lost === 0L)
  }

  test("writeBulk: permanently-down sender loses items after retries, task does not fail") {
    val spark = GraftSession.get("local[2]", "2")
    import spark.implicits._
    val docs = Seq(("idx", "d1", "{}")).toDF("es_index", "doc_id", "doc")
    val (sent, lost) = BulkRetry.writeBulk(docs.repartition(1), maxRetries = 0) { _ =>
      throw new java.io.IOException("connection refused")
    }
    assert(sent === 0L)
    assert(lost === 1L)
  }
}

object BulkRetrySpec {
  val flaky = new java.util.concurrent.atomic.AtomicBoolean(false)
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the query/oracle TEXT surface itself.
  *
  * Motivated by a real round-8 bug: `SqlTopNText` interpolated
  * `centsSql` before that val initialized (object vals initialize in
  * declaration order), producing `sum(null)` — syntactically valid
  * SQL that ran identically on BOTH engines, so the oracle compare
  * could never catch it. Text-level invariants are the only gate that
  * sees this class of failure.
  */
class OracleTextSpec extends AnyFunSuite {

  test("no oracle text contains a lowercase 'null' token (failed Scala interpolation)") {
    // SQL spellings in this repo are uppercase (IS NOT NULL); a
    // lowercase standalone `null` can only come from interpolating an
    // uninitialized val / None.toString-style accident.
    val tok = "(?<![A-Za-z_])null(?![A-Za-z_])".r
    val bad = Queries.oracles.collect {
      case (name, sql) if tok.findFirstIn(sql).isDefined => name
    }
    assert(bad.isEmpty, s"oracle texts with a raw 'null' token: $bad")
  }

  test("every declared query has an oracle and vice versa") {
    assert(Queries.all.keySet === Queries.oracles.keySet)
  }

  test("no oracle text is empty or trivially short") {
    val bad = Queries.oracles.collect { case (n, s) if s.trim.length < 20 => n }
    assert(bad.isEmpty, s"suspicious oracle texts: $bad")
  }
}

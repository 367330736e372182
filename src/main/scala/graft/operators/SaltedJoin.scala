package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting — the manual tool for the
  * cases AQE's runtime skew splitting can't reach (it only rewrites
  * sort-merge join partitions; a skewed key feeding a stream-static
  * join, or a join followed by a keyed aggregation, still funnels one
  * reducer). Salting spreads each hot key over `saltFactor` reducers:
  * the big side appends a deterministic salt in `[0, saltFactor)`, the
  * small side is replicated once per salt value (explode — ×saltFactor
  * rows, fine for a dimension side), and the join key becomes
  * (keys..., salt). Result rows are identical to the unsalted join;
  * only the partitioning changes.
  */
object SaltedJoin {

  /** Join types where replicating the small side cannot change the
    * result set: an unmatched SMALL-side row is dropped by all of
    * these. `right`/`full` would emit each unmatched small-side row
    * once per salt copy — rejected.
    */
  private val SafeJoinTypes = Set("inner", "cross", "left", "leftouter",
    "leftsemi", "leftanti")

  /** `salt` is any deterministic expression over the BIG side's rows
    * (a unique id works; uniformity, not secrecy, is the point —
    * `rand()` would break retry idempotence and result reproducibility).
    */
  def salted(big: DataFrame, small: DataFrame, keys: Seq[String],
             salt: Column, saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replaceAll("_", "")),
      s"salted join preserves semantics only for ${SafeJoinTypes.mkString("/")}, " +
        s"not '$joinType' (right/full would emit unmatched small-side rows once per salt copy)")
    val b = big.withColumn("__salt", pmod(salt, lit(saltFactor)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) building blocks: multi-pass
  * blocking for candidate generation. The classic large-scale ER
  * pipeline is
  *
  *   blocking → pairwise verify → connected components → canonical
  *
  * and this object supplies the blocking stage; verification is a
  * plain join-with-predicate on the candidate pairs (fuzzy matchers
  * like `levenshtein` are codegen built-ins), and clustering reuses
  * [[graft.dedup.Dedup.connectedComponents]] — see q126 for the full
  * composition.
  *
  * Scale shape: comparing all record pairs is O(n²) and dead at any
  * scale; blocking reduces it to Σ_blocks |block|² by comparing only
  * records sharing a cheap derived key. Each pass is a self-equi-join
  * on its blocking key (shuffled on the key, AQE-skew-splittable), and
  * multiple passes with DIFFERENT keys restore the recall a single
  * key loses to dirty fields (a corrupted phone still blocks on name,
  * and vice versa). Pass outputs are unioned and deduped on the
  * ordered pair, so downstream verification runs once per candidate
  * no matter how many passes surfaced it.
  *
  * Choose keys with bounded block sizes (exact or prefix keys on
  * near-unique fields). A low-cardinality key (e.g. country alone)
  * makes one giant block and resurrects the O(n²) it was meant to
  * kill.
  */
object EntityResolution {

  /** Ordered candidate pairs `(id_a < id_b)` from the union of one
    * self-join per blocking key. Null keys never block (an absent
    * field matches nothing — standard ER convention).
    */
  def candidates(records: DataFrame, idCol: String,
                 blockKeys: Seq[Column]): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key")
    blockKeys.map { k =>
      val keyed = records.select(col(idCol), k.as("__bk"))
        .filter(col("__bk").isNotNull)
      keyed.select(col(idCol).as("id_a"), col("__bk"))
        .join(keyed.select(col(idCol).as("id_b"), col("__bk")), "__bk")
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }.reduce(_ unionAll _).distinct()
  }
}

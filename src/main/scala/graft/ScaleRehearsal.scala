package graft

import org.apache.spark.sql.functions._

/** Two-point scaling rehearsal for the dedup chain (BASELINE.md §d).
  *
  * Synthesizes an N× documents table from the base scale — N copies
  * with offset doc_ids and every token prefixed with a copy tag, so
  * copies are DISJOINT corpora: shingle/minhash/band keys never
  * collide across copies, intra-copy duplicate structure is preserved
  * exactly, and the workload grows ~N× without manufacturing N-way
  * near-dup cliques (which identical copies would — C(N,2) candidate
  * pairs per doc, a different workload, not a scale-up).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.ScaleRehearsal [mult]` — times each dedup-chain query at 1×
  * and N×, prints one JSON line per scale.
  */
object ScaleRehearsal {
  private val ChainQueries =
    Seq("q21_dedup_minhash", "q22_dedup_ngram", "q31_dedup_groups", "q43_dedup_incremental")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val scaled = s"/tmp/graft_scale_${mult}x"
    val spark = GraftSession.get("local[32]", "32")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until mult).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"c${k}_$$1"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$scaled/documents.parquet")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
      ChainQueries.foreach(q => time(q, dir)) // warm
      val qs = ChainQueries.map(q => "\"" + q + "\":" + time(q, dir))
        .mkString("{", ",", "}")
      println(s"""{"metric":"scale_rehearsal","scale":"$label","dir":"$dir","queries":$qs}""")
    }
    spark.stop()
  }
}

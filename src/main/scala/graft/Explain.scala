package graft

/** Plan-audit surface: `runMain graft.Explain <sfDir> [names...]`
  * prints each query's formatted physical plan — the review loop for
  * scan pruning (`PushedFilters`/`ReadSchema`), join strategies,
  * exchange placement, and WholeStageCodegen span width that the
  * bench numbers summarize.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <sfDir> [queryNames...]")
    val dir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.get()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

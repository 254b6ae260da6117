package graft


/** Plan-audit utility: prints the formatted physical plan of selected
  * queries so scan pushdown (PushedFilters/ReadSchema), broadcast
  * choices, exchange counts, and WholeStageCodegen spans can be
  * reviewed. `runMain graft.Explain [sfDir] [query ...]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

package graft

/** Ad-hoc plan auditor: print the executed plan of registry queries.
  * `sbt "Test/runMain graft.PlanDump <query> [query...]"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

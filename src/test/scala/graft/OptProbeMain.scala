package graft

import org.apache.spark.sql.SparkSession

/** Round-15 optimization probe: per-query timing (the bench's xxhash64_agg
  * sink and median-of-N methodology, one query at a time so a run isolates
  * the computation under inspection) plus `.explain("formatted")` dumps for
  * the plans/r15 before/after artifacts.
  *
  * Usage (after `sbt Test/compile`, via tools/run.sh with the test classes
  * on the classpath):
  *
  *   graft.OptProbeMain time <sfDir> <runs> <query> [query...]
  *   graft.OptProbeMain plan <sfDir> <outDir> <suffix> <query> [query...]
  *
  * `time` prints one line per query: median, min, max over `runs` runs.
  * `plan` writes `<outDir>/<query>_<suffix>.txt` with the formatted plan.
  */
object OptProbeMain {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the bench's warmup
    locally {
      import spark.implicits._
      val w = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      w.join(org.apache.spark.sql.functions.broadcast(w), "k")
        .groupBy("k").count().collect()
      spark.read.parquet(s"$sfDir/region.parquet").limit(1).collect()
    }
    def fullyEvaluate(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions.{expr, xxhash64}
      df.select(xxhash64(df.columns.map(df(_)): _*).as("h"))
        .agg(expr("bit_xor(h)")).head()
      ()
    }
    mode match {
      case "time" =>
        val runs = args(2).toInt
        for (name <- args.drop(3)) {
          spark.sparkContext.setJobDescription(s"opt-probe: $name")
          val times = (0 until runs).map { _ =>
            val t0 = System.nanoTime()
            fullyEvaluate(SparkEntry.queries(name)(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }.sorted
          val med = times(times.size / 2)
          println(f"TIME $name%-28s median=${med}%7.3f min=${times.head}%7.3f max=${times.last}%7.3f runs=$runs")
        }
      case "plantime" =>
        // isolate Catalyst analysis+optimization+physical planning (driver,
        // single-threaded) from execution: executedPlan forces planning
        // without running a job
        val runs = args(2).toInt
        for (name <- args.drop(3)) {
          val times = (0 until runs).map { _ =>
            val t0 = System.nanoTime()
            val df = SparkEntry.queries(name)(spark, sfDir)
            df.select(org.apache.spark.sql.functions.xxhash64(
              df.columns.map(df(_)): _*).as("h"))
              .agg(org.apache.spark.sql.functions.expr("bit_xor(h)"))
              .queryExecution.executedPlan
            (System.nanoTime() - t0) / 1e9
          }.sorted
          println(f"PLANTIME $name%-28s median=${times(times.size / 2)}%7.3f min=${times.head}%7.3f")
        }
      case "jobs" =>
        // one run of each query with a listener that prints per-job wall
        // time + the head of the job's first stage name, so multi-job
        // queries (training loops, absorb phases) expose where time goes
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
            val m = si.taskMetrics
            println(f"  STAGE ${si.stageId}%4d wall=${wall}%7.3f cpu=${m.executorCpuTime / 1e9}%7.2f " +
              f"run=${m.executorRunTime / 1e3}%7.2f tasks=${si.numTasks}%3d " +
              f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB " +
              s"${si.name.linesIterator.next().take(40)} | " +
              si.details.linesIterator.filter(l => l.contains("graft."))
                .take(2).mkString(" <- ").take(160))
          }
        }
        spark.sparkContext.addSparkListener(listener)
        for (name <- args.drop(2)) {
          println(s"=== $name ===")
          val t0 = System.nanoTime()
          fullyEvaluate(SparkEntry.queries(name)(spark, sfDir))
          println(f"TOTAL $name ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        }
      case "plan" =>
        val outDir = java.nio.file.Paths.get(args(2))
        java.nio.file.Files.createDirectories(outDir)
        val suffix = args(3)
        for (name <- args.drop(4)) {
          val df = SparkEntry.queries(name)(spark, sfDir)
          // run once so AQE finalizes and Materialized stores populate
          fullyEvaluate(df)
          val formatted = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
            formatted.getBytes("UTF-8"))
          println(s"PLAN $name -> ${outDir.resolve(s"${name}_$suffix.txt")}")
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** r19 deliverable helper: write `.explain("formatted")` for the named
  * queries to `<outDir>/<name>_<suffix>.txt` (plans/r19). Reads the same
  * env contract as Bench. Queries whose build phase executes eagerly
  * (multi-tick IVM pipelines, index builds) explain their RETURNED
  * frame — the plan the bench's final action runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    // --build (r20, VERDICT #6): ALSO dump the plan of every frame the
    // query's build phase cuts through Iterate.materialize — the
    // subtrees a returned frame's explain hides behind checkpoint scans
    // (numbered in cut order as <name>_cut<NN>_<suffix>.txt).
    val buildMode = args.drop(2).headOption.contains("--build")
    val names = args.drop(if (buildMode) 3 else 2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    names.foreach { name =>
      try {
        val cutN = new java.util.concurrent.atomic.AtomicInteger(0)
        if (buildMode)
          graft.operators.Iterate.planRecorder = Some { cut =>
            val i = cutN.incrementAndGet()
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir,
                f"${name}%s_cut$i%02d_$suffix%s.txt"),
              fmt(cut).getBytes("UTF-8"))
          }
        val df =
          try SparkEntry.queries(name)(spark, sfDir)
          finally graft.operators.Iterate.planRecorder = None
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          fmt(df).getBytes("UTF-8"))
        println(s"[plandump] wrote $name" +
          (if (buildMode) s" (+${cutN.get} build cuts)" else ""))
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAIL $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

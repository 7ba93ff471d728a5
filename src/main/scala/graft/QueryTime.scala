package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `runMain graft.QueryTime <name> [sfDir]
  * [reps]` — runs one registered query repeatedly (first rep = warmup) and
  * prints per-rep wall times, for performance work without full-bench
  * noise. Add `explain` as reps to print the formatted plan instead.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2) else "3"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (reps == "explain") {
      fn(spark, sfDir).explain("formatted")
    } else {
      for (i <- 1 to reps.toInt) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[qtime] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}

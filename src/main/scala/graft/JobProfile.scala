package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic (guide §1): run ONE query and print a
  * per-Spark-job wall-time table with call sites, so per-query seconds
  * can be attributed to the actions inside the operator (materialize
  * cuts, commit probes, collects) instead of guessed at. Reads the same
  * env contract as Bench; not part of the bench/driver surface.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.JobProfile <query> [reps]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
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

    case class Job(id: Int, start: Long, var end: Long = -1L,
      var site: String = "", var nStages: Int = 0, var nTasks: Int = 0)
    case class Stg(id: Int, name: String, nTasks: Int, wallMs: Long,
      runMs: Long, details: String)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, Job]
    val stages = new scala.collection.mutable.ArrayBuffer[Stg]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = Job(e.jobId, e.time)
        j.site = e.stageInfos.lastOption.map(_.details.linesIterator
          .filter(l => l.contains("graft") && !l.contains("JobProfile"))
          .take(2).mkString(" <- ")).getOrElse("")
        if (j.site.isEmpty)
          j.site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        j.nStages = e.stageIds.size
        jobs(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          jobs.values.lastOption.foreach(_.nTasks += si.numTasks)
          val wall = (for (s <- si.submissionTime; c <- si.completionTime)
            yield c - s).getOrElse(-1L)
          val det = si.details.linesIterator
            .filter(l => l.contains("graft") && !l.contains("JobProfile"))
            .take(1).mkString
          stages += Stg(si.stageId, si.name, si.numTasks, wall,
            si.taskMetrics.executorRunTime, det)
        }
    }

    val fn = SparkEntry.queries(name)
    // warmup rep (JIT + codegen caches), then profiled reps
    fn(spark, sfDir).count()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    (1 to reps).foreach { _ => fn(spark, sfDir).count() }
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let queued listener events drain

    println(f"== $name%s: $reps%d reps, wall ${wall}%.3f s, " +
      f"${jobs.size}%d jobs, per-rep ${wall / reps}%.3f s")
    val rows = jobs.values.toSeq
    val totalJobMs = rows.map(j => math.max(0L, j.end - j.start)).sum
    println(f"   sum(job wall) ${totalJobMs / 1e3}%.3f s  " +
      f"(gaps = driver/planning/fs: ${wall - totalJobMs / 1e3}%.3f s)")
    rows.sortBy(j => -(j.end - j.start)).take(15).foreach { j =>
      println(f"  ${(j.end - j.start) / 1e3}%7.3f s  job=${j.id}%3d " +
        f"stages=${j.nStages}%2d tasks=${j.nTasks}%4d  ${j.site.take(170)}%s")
    }
    println(s"== stages: ${stages.size}")
    stages.sortBy(s => -s.wallMs).take(40).foreach { s =>
      println(f"  ${s.wallMs / 1e3}%7.3f s (run ${s.runMs / 1e3}%7.3f) " +
        f"tasks=${s.nTasks}%4d  ${s.name.take(60)}%s | ${s.details.take(110)}%s")
    }
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.streaming.{BatchHandler, DownloadPipeline, HarvestJob, Workspace}

/** Runnable end-to-end demo of the full reference dataflow (SURVEY.md §3):
  * provision workspace → harvest a catalog (template expansion) → queue →
  * streaming download (all five strategies, file:// sources) → object
  * sink + alert/DLQ side-outputs. Usage: `runMain graft.PipelineDemo
  * [workDir]`. Prints the resulting workspace layout.
  */
object PipelineDemo {

  def main(args: Array[String]): Unit = {
    val work = Paths.get(args.headOption.getOrElse(
      Files.createTempDirectory("graft-demo").toString))
    val src = work.resolve("remote")
    val root = work.resolve("workspace").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // "remote" corpus served over file:// (date-templated paths included)
    def put(rel: String, body: String): Unit = {
      val p = src.resolve(rel); Files.createDirectories(p.getParent)
      Files.writeString(p, body)
    }
    put("reports/2026/08/page.html",
      """<html><a href="prices_20260812.csv">p</a><a href="vol.zip">v</a></html>""")
    put("reports/2026/08/prices_20260812.csv", "sym,px\nABC,101.5")
    put("reports/2026/08/vol.zip", "zipbytes")
    put("daily/20260812.csv", "direct-daily")
    put("pub/listing.txt",
      "-rw-r--r-- 1 f f 10 Aug 12 04:00 data_20260812.zip\r\n" +
      "-rw-r--r-- 1 f f 10 Aug 12 04:00 notes.txt\r\n")
    put("pub/data_20260812.zip", "ftp-zip")

    val u = src.toUri.toString
    val catalog = work.resolve("sources.csv")
    Files.writeString(catalog, Seq(
      "ID,URL,Interval,Col3,Active,Col5,Col6,Type,Pattern,UTC",
      s"src-links,${u}reports/{year}/{month}/page.html,hourly,x,1,y,z,LINKS,ignore,0",
      s"src-direct,${u}daily/{year}{month}{day}.csv,hourly,x,1,y,z,DIRECT,prices_{year}{month}{day}.csv,0",
      s"src-ftp,${u}pub/listing.txt,hourly,x,1,y,z,FTP_FILES,data_*.zip,0",
      s"src-dead,${u}missing.html,hourly,x,1,y,z,LINKS,ignore,0",
      s"src-off,${u}whatever,hourly,x,0,y,z,LINKS,ignore,0"
    ).mkString("", "\r\n", "\r\n"))

    Workspace.provision(root)
    val n = HarvestJob.run(spark, catalog.toString,
      Timestamp.valueOf("2026-08-12 09:30:00"), "hourly", s"$root/queue")
    println(s"harvested $n tasks into queue/")

    if (args.contains("--batch")) {
      // reference-style polling loop: claim ≤5, process, ack to done/
      var report = DownloadPipeline.BatchReport(1, 0, 0, 0, 0)
      while (report.attempted > 0) {
        report = BatchHandler.runOnce(spark, root, Some(catalog.toString))
        if (report.attempted > 0) println(s"batch: $report")
      }
    } else {
      DownloadPipeline.runStream(spark, s"$root/queue", root,
        s"$root/checkpoint", catalogPath = Some(catalog.toString))
    }

    println(s"workspace: $root")
    Files.walk(Paths.get(root)).iterator().forEachRemaining { p =>
      if (Files.isRegularFile(p) && !p.toString.contains("checkpoint")
          && !p.toString.contains("queue"))
        println(s"  ${Paths.get(root).relativize(p)}  (${Files.size(p)} bytes)")
    }
    // E1 rewrites the live catalog file in place
    val updated = Files.readString(catalog)
    println("updated catalog rows flagged Active=2:")
    updated.split("\r\n").filter(_.contains(",2,")).foreach(l => println(s"  $l"))
    spark.stop()
  }
}

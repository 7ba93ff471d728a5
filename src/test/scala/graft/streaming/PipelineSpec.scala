package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Golden end-to-end downloader tests (SURVEY.md §5.2.4): every strategy
  * branch + error path + DLQ + dup-guard, driven entirely over `file://`
  * URLs — no network.
  */
class PipelineSpec extends SparkSpec {

  private def write(p: Path, s: String): Path = {
    Files.createDirectories(p.getParent); Files.writeString(p, s)
  }
  private def read(p: Path): String = Files.readString(p)

  private def setupSource(src: Path): Unit = {
    write(src.resolve("a.csv"), "alpha,1")
    write(src.resolve("b.zip"), "zip-bytes")
    write(src.resolve("page.html"),
      """<html><a href="a.csv">a</a><a href="b.zip">b</a><a href="sub/">d</a></html>""")
    write(src.resolve("c.txt"), "c-v1")
    write(src.resolve("page2.html"), """<a href="c.txt">c</a>""")
    write(src.resolve("direct.bin"), "direct-payload")
    write(src.resolve("ftpfile.bin"), "ftp-payload")
    write(src.resolve("data_1.zip"), "d1")
    write(src.resolve("data_2.zip"), "d2")
    write(src.resolve("readme.txt"), "no")
    write(src.resolve("listing.txt"),
      "-rw-r--r-- 1 f f 2 Aug 12 04:00 data_1.zip\r\n" +
      "-rw-r--r-- 1 f f 2 Aug 12 04:00 data_2.zip\r\n" +
      "-rw-r--r-- 1 f f 2 Aug 12 04:00 readme.txt\r\n")
  }

  private def tasksDF(src: Path): DataFrame = {
    import spark.implicits._
    val u = src.toUri.toString  // file:///...src/
    Seq(
      ("s-links", s"${u}page.html", "LINKS", "ignore", "0", 0),
      ("s-over", s"${u}page2.html", "LINKS_OVERWRITE", "ignore", "0", 0),
      ("s-direct", s"${u}direct.bin", "DIRECT", "direct_out.bin", "0", 0),
      ("s-dftp", s"${u}ftpfile.bin", "DIRECT_FTP", "ftp_out.bin", "0", 0),
      ("s-ftp", s"${u}listing.txt", "FTP_FILES", "data_*.zip", "0", 0),
      ("s-broken", s"${u}missing.html", "LINKS", "ignore", "0", 0),
      ("s-bogus", s"${u}page.html", "BOGUS_TYPE", "ignore", "0", 0),
      ("s-dead", s"${u}page.html", "LINKS", "ignore", "0", 5)
    ).toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts")
  }

  test("processBatch: all strategies, dup-guard, error path, DLQ") {
    val tmp = Files.createTempDirectory("graft-pipe")
    val src = tmp.resolve("src")
    val root = tmp.resolve("ws").toString
    setupSource(src)
    Workspace.provision(root)

    val report = DownloadPipeline.processBatch(tasksDF(src), root)

    // K3 sink layout per strategy (data_downloader.py:104-107,132,170,195)
    assert(read(Paths.get(root, "out/LINK/a.csv")) === "alpha,1")
    assert(read(Paths.get(root, "out/LINK/b.zip")) === "zip-bytes")
    assert(read(Paths.get(root, "out/LINKS_OVER/c.txt")) === "c-v1")
    assert(read(Paths.get(root, "out/LINKS_DIRECT/direct_out.bin")) === "direct-payload")
    assert(read(Paths.get(root, "out/FTP_FILE/ftp_out.bin")) === "ftp-payload")
    assert(read(Paths.get(root, "out/FTP_FILES/data_1.zip")) === "d1")
    assert(read(Paths.get(root, "out/FTP_FILES/data_2.zip")) === "d2")
    // glob filtered readme.txt out; dir link dropped by empty basename
    assert(!Files.exists(Paths.get(root, "out/FTP_FILES/readme.txt")))

    // E2 alerts: one for the unreadable page, one for the unknown type
    val alerts = spark.read.text(s"$root/alerts").collect().map(_.getString(0))
    assert(alerts.length === 2, alerts.mkString("\n"))
    assert(alerts.exists(a => a.contains("s-broken")))
    assert(alerts.exists(a => a.contains("s-bogus") && a.contains("Unknown source type")))

    // E4: exhausted task dead-lettered, not fetched
    val dead = spark.read.text(s"$root/dead_letter").collect().map(_.getString(0))
    assert(dead.length === 1 && dead.head.contains("s-dead"))
    assert(report.deadLettered === 1)
    assert(report.errors === 2)
    assert(report.downloaded === 7)

    // D1 dup-guard: change upstream content; LINKS must keep the old file
    // (no overwrite), LINKS_OVERWRITE must replace it.
    write(src.resolve("a.csv"), "alpha,CHANGED")
    write(src.resolve("c.txt"), "c-v2")
    DownloadPipeline.processBatch(tasksDF(src), root)
    assert(read(Paths.get(root, "out/LINK/a.csv")) === "alpha,1")
    assert(read(Paths.get(root, "out/LINKS_OVER/c.txt")) === "c-v2")
  }

  test("D1 guard reads the names manifest, not a sink directory listing") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-manifest")
    val src = tmp.resolve("src")
    val root = tmp.resolve("ws").toString
    setupSource(src)
    Workspace.provision(root)
    import spark.implicits._
    val u = src.toUri.toString
    val tasks = Seq(("s-links", s"${u}page.html", "LINKS", "ignore", "0", 0))
      .toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts")

    DownloadPipeline.processBatch(tasks, root)
    assert(read(Paths.get(root, "out/LINK/a.csv")) === "alpha,1")
    // the write appended a (prefix, name) manifest row per object
    val manifest = spark.read
      .parquet(graft.sinks.ObjectSink.manifestPath(s"$root/out"))
      .select(col("prefix"), col("name")).as[(String, String)].collect().toSet
    assert(manifest === Set("LINK" -> "a.csv", "LINK" -> "b.zip"))

    // Remove the sink OBJECTS but keep the manifest: a directory-listing
    // guard would see an empty sink and re-download; the manifest-backed
    // guard must still skip both names across a fresh run.
    Files.delete(Paths.get(root, "out/LINK/a.csv"))
    Files.delete(Paths.get(root, "out/LINK/b.zip"))
    DownloadPipeline.processBatch(tasks, root)
    assert(!Files.exists(Paths.get(root, "out/LINK/a.csv")),
      "guard consulted the sink directory instead of the manifest")
    assert(!Files.exists(Paths.get(root, "out/LINK/b.zip")))

    // Compaction folds the accumulated per-batch delta files into one
    // deduplicated pointer-committed snapshot generation and deletes the
    // folded deltas; the guard must behave identically after.
    val n = graft.sinks.ObjectSink.compactManifest(spark, s"$root/out")
    assert(n === 2L)
    val after = graft.sinks.ObjectSink.manifestAll(spark, s"$root/out").get
      .select(col("prefix"), col("name")).as[(String, String)].collect().toSet
    assert(after === manifest)
    // the folded delta files are gone (only markers like _SUCCESS remain)
    import scala.jdk.CollectionConverters._
    val leftover = Files.list(Paths.get(
      graft.sinks.ObjectSink.manifestPath(s"$root/out")))
    try assert(!leftover.iterator().asScala.exists(
      _.getFileName.toString.startsWith("part-")))
    finally leftover.close()
    DownloadPipeline.processBatch(tasks, root)
    assert(!Files.exists(Paths.get(root, "out/LINK/a.csv")),
      "guard regressed after manifest compaction")
  }

  test("D1 bootstrap: a legacy pre-manifest sink seeds the manifest once") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-legacy")
    val src = tmp.resolve("src")
    val root = tmp.resolve("ws").toString
    setupSource(src)
    Workspace.provision(root)
    import spark.implicits._
    val u = src.toUri.toString
    val tasks = Seq(("s-links", s"${u}page.html", "LINKS", "ignore", "0", 0))
      .toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts")

    // legacy sink: objects exist on disk, NO manifest
    write(Paths.get(root, "out/LINK/a.csv"), "legacy-v1")
    val r1 = DownloadPipeline.processBatch(tasks, root)
    // a.csv guarded by the directory listing (not re-downloaded),
    // b.zip fetched fresh
    assert(read(Paths.get(root, "out/LINK/a.csv")) === "legacy-v1")
    assert(r1.downloaded === 1)
    // the listing SEEDED the manifest, so the legacy name is now durable
    // guard history: delete the object, re-run — still not re-fetched
    val manifest = spark.read
      .parquet(graft.sinks.ObjectSink.manifestPath(s"$root/out"))
      .select(col("name")).as[String].collect().toSet
    assert(manifest === Set("a.csv", "b.zip"))
    Files.delete(Paths.get(root, "out/LINK/a.csv"))
    val r2 = DownloadPipeline.processBatch(tasks, root)
    assert(r2.downloaded === 0)
    assert(!Files.exists(Paths.get(root, "out/LINK/a.csv")),
      "legacy object re-downloaded after the manifest took over")
  }

  test("E1: failed source flags Active:=2 in the rewritten catalog") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-e1")
    val root = tmp.resolve("ws").toString
    Workspace.provision(root)
    // private catalog copy (never touch the repo fixture)
    val catPath = tmp.resolve("sources.csv").toString
    Files.copy(Paths.get(graft.sources.Catalog.fixturePath), Paths.get(catPath))

    def failTask(id: String) = Seq(
      (id, tmp.resolve("nope.txt").toUri.toString, "FTP_FILES", "*", "0", 0)
    ).toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts")
    def activeById = graft.sources.Catalog.read(spark, catPath)
      .select("id", "active").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

    // flags land in the LIVE catalog (reference's side-path bug not
    // reproduced), and accumulate across batches
    DownloadPipeline.processBatch(failTask("src-003"), root, Some(catPath))
    assert(activeById("src-003") === 2)
    assert(activeById("src-001") === 1)
    DownloadPipeline.processBatch(failTask("src-001"), root, Some(catPath))
    val after = activeById
    assert(after("src-001") === 2)
    assert(after("src-003") === 2, "flag from the earlier batch was lost")
  }

  test("E4: recoverStale re-enqueues stranded tasks with attempts+1 → DLQ") {
    val tmp = Files.createTempDirectory("graft-e4")
    val root = tmp.resolve("ws").toString
    Workspace.provision(root)
    // a crashed batch left a claimed task file in processing/
    write(Paths.get(root, "processing", "t1.json"),
      """{"ID":"s-x","URL":"file:///nope","TYPE":"DIRECT","PATTERN":"p","UTC":"0","attempts":3}""")
    assert(BatchHandler.recoverStale(root) === 1)
    assert(!Files.exists(Paths.get(root, "processing", "t1.json")))
    val requeued = spark.read.schema(graft.model.Schemas.task)
      .json(s"$root/queue").collect()
    assert(requeued.length === 1)
    assert(requeued.head.getAs[Int]("attempts") === 4)
    // one more crash+sweep exhausts it: attempts reaches 5 → dead-letter
    val f = {
      val s = Files.list(Paths.get(root, "queue"))
      try { val l = s.iterator().next(); l } finally s.close()
    }
    Files.move(f, Paths.get(root, "processing", f.getFileName.toString))
    assert(BatchHandler.recoverStale(root) === 1)
    val report = BatchHandler.runOnce(spark, root)
    assert(report.deadLettered === 1 && report.attempted === 1)
    val dead = spark.read.text(s"$root/dead_letter").collect().map(_.getString(0))
    assert(dead.length === 1 && dead.head.contains("s-x"))
  }

  test("batch handler: claim/process/ack moves queue files to done/") {
    val tmp = Files.createTempDirectory("graft-batch")
    val src = tmp.resolve("src")
    val root = tmp.resolve("ws").toString
    setupSource(src)
    Workspace.provision(root)
    import spark.implicits._
    val u = src.toUri.toString
    graft.sources.Queue.enqueue(
      Seq(("s-direct", s"${u}direct.bin", "DIRECT", "direct_out.bin", "0", 0))
        .toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts"),
      s"$root/queue")

    val report = BatchHandler.runOnce(spark, root)
    assert(report.downloaded === 1)
    assert(read(Paths.get(root, "out/LINKS_DIRECT/direct_out.bin")) === "direct-payload")
    // queue drained, files acked into done/
    assert(BatchHandler.runOnce(spark, root).attempted === 0)
    val doneFiles = Files.list(Paths.get(root, "done"))
    try assert(doneFiles.count() > 0) finally doneFiles.close()
  }

  test("batch handler: poison lines land in quarantine/ before their file acks") {
    val tmp = Files.createTempDirectory("graft-poison")
    val src = tmp.resolve("src")
    val root = tmp.resolve("ws").toString
    setupSource(src)
    Workspace.provision(root)
    val u = src.toUri.toString
    // one good task and one corrupt line in the same queue file
    write(Paths.get(root, "queue", "mixed.json"),
      s"""{"ID":"s-ok","URL":"${u}direct.bin","TYPE":"DIRECT","PATTERN":"direct_out.bin","UTC":"0","attempts":0}
         |{not json at all""".stripMargin)
    val report = BatchHandler.runOnce(spark, root)
    assert(report.downloaded === 1)
    // the file acked away (poison must not redeliver forever) ...
    assert(Files.exists(Paths.get(root, "done", "mixed.json")))
    // ... but the dropped raw line has a durable record the error path
    // can inspect — Queue.quarantined(queueDir) can no longer see it
    // because the ack moved the file out of queue/
    val q = spark.read.text(s"$root/quarantine").collect().map(_.getString(0))
    assert(q.toSeq === Seq("{not json at all"))
  }

  test("streaming: harvest → queue → AvailableNow drain; checkpoint acks") {
    val tmp = Files.createTempDirectory("graft-stream")
    val src = tmp.resolve("src")
    val root = tmp.resolve("ws").toString
    setupSource(src)
    Workspace.provision(root)
    val queueDir = s"$root/queue"
    val checkpoint = s"$root/checkpoint"

    import spark.implicits._
    val u = src.toUri.toString
    graft.sources.Queue.enqueue(
      Seq(("s-direct", s"${u}direct.bin", "DIRECT", "direct_out.bin", "0", 0))
        .toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts"),
      queueDir)

    DownloadPipeline.runStream(spark, queueDir, root, checkpoint)
    assert(read(Paths.get(root, "out/LINKS_DIRECT/direct_out.bin")) === "direct-payload")

    // E3 ack: a second drain re-processes nothing (checkpoint committed) —
    // prove by deleting the sink object and the upstream source: a retry
    // would either fail (alert) or rewrite the object.
    Files.delete(Paths.get(root, "out/LINKS_DIRECT/direct_out.bin"))
    Files.delete(src.resolve("direct.bin"))
    DownloadPipeline.runStream(spark, queueDir, root, checkpoint)
    assert(!Files.exists(Paths.get(root, "out/LINKS_DIRECT/direct_out.bin")))
    assert(!Files.exists(Paths.get(root, "alerts")) ||
      spark.read.text(s"$root/alerts").isEmpty)
  }

  test("streaming: the offset-log (Kafka-model) transport is a drop-in") {
    val tmp = Files.createTempDirectory("graft-stream-olog")
    val src = tmp.resolve("src")
    val root = tmp.resolve("ws").toString
    setupSource(src)
    Workspace.provision(root)
    val channel = graft.sources.OffsetLogChannel(s"$root/olog", nPartitions = 2)

    import spark.implicits._
    val u = src.toUri.toString
    channel.enqueue(
      Seq(("s-direct", s"${u}direct.bin", "DIRECT", "direct_out.bin", "0", 0),
        ("s-links", s"${u}page.html", "LINKS", "ignore", "0", 0))
        .toDF("ID", "URL", "TYPE", "PATTERN", "UTC", "attempts"))

    DownloadPipeline.runStream(spark, channel, root, s"$root/checkpoint", None)
    assert(read(Paths.get(root, "out/LINKS_DIRECT/direct_out.bin")) === "direct-payload")
    assert(read(Paths.get(root, "out/LINK/a.csv")) === "alpha,1")

    // the checkpoint is the ack: a second drain re-processes nothing
    Files.delete(Paths.get(root, "out/LINKS_DIRECT/direct_out.bin"))
    Files.delete(src.resolve("direct.bin"))
    DownloadPipeline.runStream(spark, channel, root, s"$root/checkpoint", None)
    assert(!Files.exists(Paths.get(root, "out/LINKS_DIRECT/direct_out.bin")))
  }
}

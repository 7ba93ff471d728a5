package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.fetch.Fetch.FileResult

/** Partitioned object sink (reference K3, `data_downloader.py:102-107,132,
  * 170,195`): raw-blob fidelity — each artifact is written as its own
  * object at `<root>/<strategy-prefix>/<name>`, exactly like the
  * reference's `put_object` keys.
  *
  * Idempotent PUT semantics: write-to-temp + atomic move, so Spark task
  * retries/speculation can never leave torn objects, and re-delivery of a
  * task overwrites with identical content (at-least-once → effectively
  * once at the sink). `overwrite=false` (LINKS vs LINKS_OVERWRITE flag,
  * `data_downloader.py:72,219-220`) skips keys that already exist —
  * completing the reference's unimplemented duplicate-download guard (D1)
  * at the storage layer.
  *
  * Executed with `foreachPartition`: distributed, no driver collect.
  */
object ObjectSink {

  def write(artifacts: Dataset[FileResult], root: String, overwrite: Boolean): Unit = {
    artifacts.foreachPartition { (it: Iterator[FileResult]) =>
      it.foreach { a =>
        if (a.error == null && a.body != null) {
          val target = Paths.get(root, a.key)
          Files.createDirectories(target.getParent)
          if (overwrite || !Files.exists(target)) {
            val tmp = Files.createTempFile(target.getParent, ".tmp-", ".part")
            Files.write(tmp, a.body)
            Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
          }
        }
      }
    }
  }

  /** Names-manifest table: one (prefix, name) row per object written
    * through this sink, appended as parquet under `<root>/_manifest`.
    * This is the D1 dup-guard's object-store-scale "existing" side: a
    * distributed parquet scan (the `prefix` equality filter prunes via
    * row-group stats; a real deployment would partition the table by
    * prefix/date), in place of a driver-side directory listing that
    * can't enumerate billions of keys. Append-only; duplicate rows from
    * batch re-delivery are harmless to the guard (anti-join/Bloom
    * membership). A periodic compaction job can rewrite it, same as any
    * append table.
    */
  def manifestPath(root: String): String = s"$root/_manifest"

  /** Append the successfully-written artifacts' names to the manifest.
    * Call right after [[write]] with the same error-free dataset; on a
    * failed append the next batch simply re-fetches and skip-writes
    * (at-least-once), then re-appends.
    */
  def appendManifest(written: Dataset[FileResult], root: String): Unit = {
    val rows = written.filter(col("error").isNull && col("body").isNotNull)
      .select(
        regexp_extract(col("key"), "^(.*)/[^/]*$", 1).as("prefix"),
        element_at(split(col("key"), "/"), -1).as("name"))
    // an all-skipped/all-error batch must not conjure an empty manifest
    // (which would flip later guards off the bootstrap path)
    if (!rows.isEmpty) rows.write.mode("append").parquet(manifestPath(root))
  }

  /** The manifest's names for one strategy prefix, as a distributed
    * frame — None when no manifest exists yet (bootstrap/legacy sink).
    * Explicit schema: a manifest dir holding only _SUCCESS (possible
    * after an all-error batch) must read as empty, not fail inference.
    * If a crash between [[compactManifest]]'s two renames left only the
    * displaced `.old` generation behind, it is restored first — the
    * guard never silently loses its history to a half-finished swap.
    */
  def manifestNames(spark: SparkSession, root: String,
      prefix: String): Option[DataFrame] = {
    val path = Paths.get(manifestPath(root))
    val old = path.resolveSibling(path.getFileName.toString + ".old")
    if (!Files.isDirectory(path) && Files.isDirectory(old))
      Files.move(old, path)
    if (!Files.isDirectory(path)) None
    else Some(spark.read.schema("prefix STRING, name STRING")
      .parquet(manifestPath(root))
      .filter(col("prefix") === prefix).select(col("name")))
  }

  /** Seed the manifest with names discovered OUTSIDE it (a legacy sink's
    * pre-manifest objects, found by one bounded directory listing) so
    * every later batch takes the manifest path and the legacy objects
    * stay guarded forever — without this, the first post-manifest batch
    * would re-download everything the manifest never saw.
    */
  def seedManifest(spark: SparkSession, root: String, prefix: String,
      names: Seq[String]): Unit = {
    import spark.implicits._
    if (names.nonEmpty)
      names.toDF("name").select(lit(prefix).as("prefix"), col("name"))
        .write.mode("append").parquet(manifestPath(root))
  }

  /** Compact the append-only manifest: rewrite all accumulated
    * (prefix, name) rows — one small file per batch per branch — into a
    * deduplicated snapshot, atomically swapped in (write to a side dir,
    * then two renames). Run it like any table-maintenance job (size- or
    * count-triggered); the guard's read path is unchanged. Distinct
    * shuffles only manifest rows (names, never objects), and the swap
    * window is the same replace-in-place pattern as
    * [[graft.sources.Catalog.replaceInPlace]].
    *
    * Crash safety: stale `.compact`/`.old` generations from an earlier
    * interrupted run are cleaned (or restored — see [[manifestNames]])
    * up front, so a crash can neither wedge the next compaction nor
    * lose history; if the swap itself fails after the live manifest was
    * displaced, it is rolled back in place.
    *
    * @return number of rows in the compacted snapshot. */
  def compactManifest(spark: SparkSession, root: String): Long = {
    val path = Paths.get(manifestPath(root))
    val tmp = path.resolveSibling(path.getFileName.toString + ".compact")
    val old = path.resolveSibling(path.getFileName.toString + ".old")
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
    // recover/clean any half-finished earlier swap BEFORE starting
    if (!Files.isDirectory(path) && Files.isDirectory(old)) Files.move(old, path)
    rmTree(tmp); rmTree(old)
    if (!Files.isDirectory(path)) return 0L
    val snapshot = spark.read.schema("prefix STRING, name STRING")
      .parquet(manifestPath(root)).distinct()
    snapshot.write.mode("overwrite").parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    Files.move(path, old)
    try Files.move(tmp, path)
    catch { case e: Exception => Files.move(old, path); throw e }
    try rmTree(old) catch { case _: Exception => () } // manifestNames restores if a crash leaves only .old
    n
  }

  /** Names already present under `<root>/<prefix>/` — the D1 dup-guard's
    * "existing" side for the anti-join form. LEGACY/bootstrap path for
    * sinks predating the manifest: a driver-side listing only works when
    * the sink is a small local directory; [[manifestNames]] is the scale
    * path and wins whenever a manifest exists.
    */
  def existingNames(root: String, prefix: String): Seq[String] = {
    val dir = Paths.get(root, prefix)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.startsWith(".tmp-")).toSeq
      } finally s.close()
    }
  }
}

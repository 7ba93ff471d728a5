package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the standard
  * maintenance op a long-running ingest needs at scale: streaming
  * micro-batches and per-task writers accumulate files far smaller than
  * a parquet row group, and scan parallelism/planning cost degrade with
  * file count (every file is an open+footer-read at plan time).
  *
  * Two commit strategies:
  *  - [[compactParquet]] / [[compactPartitioned]] — rewrite-and-swap for
  *    plain parquet directories on a REAL filesystem (HDFS, local):
  *    write to a hidden-sibling temp dir, then swap via directory
  *    renames, which are atomic there. The temp and set-aside dirs use a
  *    leading-dot name Spark's listing ignores, so a crash mid-swap can
  *    never surface duplicate or phantom partitions. NOT for S3-class
  *    object stores, which have no atomic rename.
  *  - [[compactGenerations]] — for tables kept under the [[Generations]]
  *    pointer-file protocol: the compacted snapshot becomes a new
  *    immutable generation and the commit is one pointer object, correct
  *    on object stores too (and the read side never observes a swap
  *    window at all). This is the 100 TB-posture path.
  *
  * Data is byte-identical modulo row order (parquet re-encode).
  * Partitioned layouts (`col=value` subdirs) are compacted per-partition
  * so pruning survives. Single-writer per directory by contract.
  */
object Compact {

  /** Compact one parquet directory (non-partitioned).
    * @return (files before, files after)
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val before = dataFiles.length
    if (before <= 1) return (before, before)
    val totalBytes = dataFiles.map(_.getLen).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (parts >= before) return (before, before) // already at/under target

    // hidden sibling names (leading dot): invisible to Spark's partition
    // discovery and file listing for the whole swap window
    val tmp = new Path(path.getParent, "." + path.getName + ".compact-tmp")
    spark.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(path.getParent, "." + path.getName + ".compact-old")
    fs.delete(old, true)
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old, true)

    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    (before, after)
  }

  /** Compact a [[Generations]] table: if the LIVE CONTENT (the log span
    * — for a snapshot table that is just the newest generation; for a
    * log table, every delta since the last snapshot-kind commit) holds
    * more files than ceil(total_bytes / targetBytes), rewrite it as one
    * new generation at that width and pointer-commit it (then GC
    * history). The commit is a snapshot-kind `-`, which SUPERSEDES the
    * compacted span in the log view (and carries the span's replay
    * witness — see [[Generations.Commit]]), so on a log table this is a
    * squash-at-target-width, never a duplicate delta. Optimistic
    * concurrency: the commit is pinned to the version the compaction
    * read; a concurrent append aborts-and-redoes it rather than being
    * silently folded away. No renames of data anywhere — object-store
    * safe.
    * `minRatio` guards against over-eager rewrites: the compaction only
    * runs when the live file count exceeds `minRatio ×` the target
    * width (at 1.0, any reduction at all triggers it — the original
    * semantics; [[Generations.maintain]] passes its fragmentation
    * ratio so a wide snapshot plus one small delta is NOT rewritten
    * wholesale every schedule tick).
    * @return (files before, files after) of the live content
    */
  def compactGenerations(spark: SparkSession, table: String,
      targetBytes: Long = 128L * 1024 * 1024,
      maxRetries: Int = 5, minRatio: Double = 1.0): (Int, Int) = {
    val r = compactGenerationsDetailed(spark, table, targetBytes,
      maxRetries, minRatio)
    (r._1, r._2)
  }

  /** [[compactGenerations]] plus the commit it produced (None when it
    * declined) — [[Generations.maintain]] records produced versions so
    * [[Catalog.maintain]] can prove a re-point candidate chain is
    * maintenance-only (content-preserving) rather than trusting a
    * pre-maintenance head sample (TOCTOU vs a concurrent transaction).
    */
  def compactGenerationsDetailed(spark: SparkSession, table: String,
      targetBytes: Long = 128L * 1024 * 1024,
      maxRetries: Int = 5, minRatio: Double = 1.0)
      : (Int, Int, Option[Generations.Commit]) = {
    val fs = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(dir: Path) = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    var attempt = 0
    while (true) {
      val base = Generations.latest(spark, table)
        .map(_.version).getOrElse(return (0, 0, None))
      val span = Generations.logCommits(spark, table)
      val dataFiles = span
        .flatMap(c => partFiles(new Path(Generations.genPath(table, c))))
      val before = dataFiles.length
      if (before <= 1) return (before, before, None)
      val totalBytes = dataFiles.map(_.getLen).sum
      val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      if (parts * minRatio >= before) return (before, before, None)
      try {
        val next = Generations.writeAndCommit(spark,
          Generations.readLog(spark, table).get.repartition(parts), table,
          expectedBase = Some(base))
        Generations.gc(spark, table, keep = 2)
        val after = partFiles(new Path(Generations.genPath(table, next))).length
        return (before, after, Some(next))
      } catch {
        case _: Generations.CommitConflictException if attempt < maxRetries - 1 =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Compact every `col=value` partition directory of a partitioned
    * parquet table independently (pruning layout preserved; partitions
    * already at target are untouched).
    */
  def compactPartitioned(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[(String, Int, Int)] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.startsWith("."))
      .toSeq.map { p =>
        val (b, a) = compactParquet(spark, p.getPath.toString, targetBytes)
        (p.getPath.getName, b, a)
      }
  }
}

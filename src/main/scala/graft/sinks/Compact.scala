package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the standard
  * maintenance op a long-running ingest needs at scale: streaming
  * micro-batches and per-task writers accumulate files far smaller than
  * a parquet row group, and scan parallelism/planning cost degrade with
  * file count (every file is an open+footer-read at plan time).
  *
  * Rewrite-and-swap: read the directory, `repartition` to
  * ceil(total_bytes / targetBytes) partitions, write to a temp dir, then
  * atomically swap directories. Readers see either the old or the new
  * layout, never a mix; the data is byte-identical modulo row order
  * (parquet re-encode). Partitioned layouts (`col=value` subdirs) are
  * compacted per-partition so pruning survives.
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

    val tmp = new Path(dir + ".compact-tmp")
    spark.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(dir + ".compact-old")
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old, true)

    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    (before, after)
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
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .toSeq.map { p =>
        val (b, a) = compactParquet(spark, p.getPath.toString, targetBytes)
        (p.getPath.getName, b, a)
      }
  }
}

package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pointer-file ("generation") commit protocol for snapshot-replaced
  * tables — the object-store-safe alternative to rename-swapping a
  * directory in place.
  *
  * Why: `fs.rename(dirA, dirB)` is atomic on a real filesystem but does
  * not exist on S3-class object stores (the S3A "rename" is a per-object
  * copy+delete loop a reader can observe half-done). The reference's own
  * deployment assumes S3 (`wiki.md:139-141`), so at the stated 100 TB
  * design point any maintenance op that commits via directory rename is
  * wrong. The lakehouse answer (Delta/Iceberg): data lives in immutable,
  * uniquely-named generation directories that are NEVER renamed or
  * rewritten, and the commit is the creation of one tiny immutable
  * pointer object naming the live generation. Single-object creation is
  * atomic on both a local filesystem (temp + same-directory rename) and
  * S3 (a PUT is all-or-nothing; readers see the old or the new object,
  * never bytes of both).
  *
  * Layout under `<table>/`:
  *  - `data/g{version}-{uuid}/` — immutable parquet generation dirs
  *  - `_commits/v{%016d}`      — one immutable pointer file per commit:
  *                               `version gen rows` on one line
  *
  * Protocol:
  *  - WRITE: materialize the new snapshot into a fresh `data/g…` dir,
  *    then publish `_commits/v{N+1}` (write `.tmp`, single-object rename).
  *  - READ: list `_commits`, take the max version, read its gen dir.
  *  - GC: delete commit files older than the newest `keep` and any gen
  *    dir no kept commit references — deletes only, idempotent, so a
  *    crashed GC just runs again.
  *
  * Crash safety, every window: a crash before the pointer publish leaves
  * an orphaned (unreferenced, invisible) gen dir for GC; a crash after
  * leaves stale-but-referenced history GC prunes later. At no point can a
  * reader observe a missing, partial, or duplicated snapshot — the
  * failure mode of the rename-pair swap this replaces.
  *
  * Single writer per table by contract (same as the swap it replaces).
  * For multi-writer on S3, publish the pointer with a conditional PUT
  * (If-None-Match: *) and retry on conflict — the protocol is unchanged.
  */
object Generations {

  final case class Commit(version: Long, gen: String, rows: Long)

  private def commitsDir(table: Path) = new Path(table, "_commits")
  private def dataDir(table: Path) = new Path(table, "data")
  private def commitName(v: Long) = f"v$v%016d"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The newest committed generation, or None for an empty/new table. */
  def latest(spark: SparkSession, table: String): Option[Commit] = {
    val cd = commitsDir(new Path(table))
    val fs = fsOf(spark, cd)
    if (!fs.exists(cd)) return None
    val names = fs.listStatus(cd).map(_.getPath.getName)
      .filter(_.matches("v\\d{16}"))
    if (names.isEmpty) None
    else {
      val top = names.maxBy(_.drop(1).toLong)
      val in = fs.open(new Path(cd, top))
      val line = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next() finally in.close()
      val Array(v, gen, rows) = line.trim.split(" ")
      Some(Commit(v.toLong, gen, rows.toLong))
    }
  }

  /** Path of a commit's generation directory. */
  def genPath(table: String, c: Commit): String =
    new Path(dataDir(new Path(table)), c.gen).toString

  /** Read the current snapshot as a DataFrame (None: never committed). */
  def read(spark: SparkSession, table: String): Option[DataFrame] =
    latest(spark, table).map(c => spark.read.parquet(genPath(table, c)))

  /** Materialize `df` as the table's next generation and publish it.
    * The data write targets a fresh uniquely-named dir (never touching
    * the live generation); the publish is one temp-write + SAME-DIRECTORY
    * single-object rename — the only rename in the protocol, and the one
    * kind that is atomic-equivalent on object stores too.
    */
  def writeAndCommit(spark: SparkSession, df: DataFrame,
      table: String): Commit = {
    val t = new Path(table)
    val fs = fsOf(spark, t)
    val version = latest(spark, table).map(_.version + 1).getOrElse(1L)
    val gen = f"g$version%08d-${java.util.UUID.randomUUID.toString.take(8)}"
    val genDir = new Path(dataDir(t), gen)
    df.write.parquet(genDir.toString)
    val rows = spark.read.parquet(genDir.toString).count()
    val cd = commitsDir(t)
    fs.mkdirs(cd)
    val tmp = new Path(cd,
      s".${commitName(version)}.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(s"$version $gen $rows\n".getBytes("UTF-8"))
    finally out.close()
    val finalP = new Path(cd, commitName(version))
    if (!fs.rename(tmp, finalP)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit $finalP already exists — concurrent writer? " +
          "(single writer per table by contract)")
    }
    Commit(version, gen, rows)
  }

  /** Prune history: keep the newest `keep` commits (and their gen dirs),
    * delete everything older plus any unreferenced gen dir and stale
    * commit temp files. Deletes only — idempotent and crash-safe.
    * @return (commit files deleted, gen dirs deleted)
    */
  def gc(spark: SparkSession, table: String, keep: Int = 2): (Int, Int) = {
    require(keep >= 1, "must keep at least the live generation")
    val t = new Path(table)
    val fs = fsOf(spark, t)
    val cd = commitsDir(t)
    if (!fs.exists(cd)) return (0, 0)
    val all = fs.listStatus(cd).map(_.getPath.getName)
    val commits = all.filter(_.matches("v\\d{16}")).sortBy(_.drop(1).toLong)
    val stale = all.filter(n => n.startsWith(".") && n.endsWith(".tmp"))
    val (drop, kept) = commits.splitAt(math.max(0, commits.length - keep))
    val keptGens = kept.map { n =>
      val in = fs.open(new Path(cd, n))
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next().trim.split(" ")(1) finally in.close()
    }.toSet
    (drop ++ stale).foreach(n => fs.delete(new Path(cd, n), false))
    val dd = dataDir(t)
    val orphans =
      if (!fs.exists(dd)) Array.empty[Path]
      else fs.listStatus(dd).map(_.getPath)
        .filter(p => !keptGens.contains(p.getName))
    orphans.foreach(fs.delete(_, true))
    (drop.length + stale.length, orphans.length)
  }
}

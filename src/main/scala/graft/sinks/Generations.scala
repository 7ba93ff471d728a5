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
  *                               `version gen rows tag` on one line
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

  /** `tag` is free metadata recorded in the pointer: "-" for plain
    * snapshot commits, a caller id (e.g. `batch=7`) for idempotent log
    * appends, [[SquashTag]] for a log-folding snapshot.
    */
  final case class Commit(version: Long, gen: String, rows: Long,
      tag: String = "-")

  /** Tag marking a commit that supersedes ALL earlier commits of a log
    * table (the Delta-checkpoint analog): [[readLog]] starts here.
    */
  val SquashTag = "=squash"

  private def commitsDir(table: Path) = new Path(table, "_commits")
  private def dataDir(table: Path) = new Path(table, "data")
  private def commitName(v: Long) = f"v$v%016d"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parseCommit(fs: FileSystem, cd: Path, name: String): Commit = {
    val in = fs.open(new Path(cd, name))
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next() finally in.close()
    val parts = line.trim.split(" ")
    Commit(parts(0).toLong, parts(1), parts(2).toLong,
      if (parts.length > 3) parts(3) else "-")
  }

  /** Every commit of the table, version-ascending. */
  def commits(spark: SparkSession, table: String): Seq[Commit] = {
    val cd = commitsDir(new Path(table))
    val fs = fsOf(spark, cd)
    if (!fs.exists(cd)) return Seq.empty
    fs.listStatus(cd).map(_.getPath.getName)
      .filter(_.matches("v\\d{16}"))
      .sortBy(_.drop(1).toLong)
      .map(parseCommit(fs, cd, _)).toSeq
  }

  /** The newest committed generation, or None for an empty/new table.
    * Opens exactly ONE commit file (the max-named): [[writeAndCommit]]
    * calls this per append, so on a long-lived log table it must not be
    * O(commits) parses the way [[commits]] necessarily is.
    */
  def latest(spark: SparkSession, table: String): Option[Commit] = {
    val cd = commitsDir(new Path(table))
    val fs = fsOf(spark, cd)
    if (!fs.exists(cd)) return None
    val names = fs.listStatus(cd).map(_.getPath.getName)
      .filter(_.matches("v\\d{16}"))
    if (names.isEmpty) None
    else Some(parseCommit(fs, cd, names.maxBy(_.drop(1).toLong)))
  }

  /** Path of a commit's generation directory. */
  def genPath(table: String, c: Commit): String =
    new Path(dataDir(new Path(table)), c.gen).toString

  /** Read the current snapshot as a DataFrame (None: never committed). */
  def read(spark: SparkSession, table: String): Option[DataFrame] =
    latest(spark, table).map(c => spark.read.parquet(genPath(table, c)))

  /** Time travel: the snapshot as of commit `version` (None if that
    * version was never committed or its generation has been GC'd). What
    * history is travelable is exactly [[gc]]'s `keep` dial — the
    * Delta/Iceberg retention trade.
    */
  def readAt(spark: SparkSession, table: String,
      version: Long): Option[DataFrame] =
    commits(spark, table).find(_.version == version).flatMap { c =>
      val p = new Path(genPath(table, c))
      val fs = fsOf(spark, p)
      if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
    }

  /** Materialize `df` as the table's next generation and publish it.
    * The data write targets a fresh uniquely-named dir (never touching
    * the live generation); the publish is one temp-write + SAME-DIRECTORY
    * single-object rename — the only rename in the protocol, and the one
    * kind that is atomic-equivalent on object stores too.
    */
  def writeAndCommit(spark: SparkSession, df: DataFrame,
      table: String, tag: String = "-"): Commit = {
    require(!tag.contains(" ") && tag.nonEmpty, s"tag must be space-free: '$tag'")
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
    try out.write(s"$version $gen $rows $tag\n".getBytes("UTF-8"))
    finally out.close()
    val finalP = new Path(cd, commitName(version))
    if (!fs.rename(tmp, finalP)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit $finalP already exists — concurrent writer? " +
          "(single writer per table by contract)")
    }
    Commit(version, gen, rows, tag)
  }

  // ------------------------------------------------------------ log tables
  //
  // The same protocol also carries APPEND-ONLY (log) tables: each commit is
  // a delta whose rows add to the table, and a SquashTag commit folds all
  // history into one generation (the Delta-checkpoint analog). This is the
  // exactly-once answer for Structured Streaming's foreachBatch on object
  // stores: Spark re-delivers a micro-batch after a crash with the SAME
  // batchId, so committing each batch under tag `batch=<id>` makes the
  // replay a visible no-op — no duplicated rows, no torn files.

  /** Commits a [[readLog]] union spans: everything from the newest
    * squash (inclusive) onward.
    */
  def logCommits(spark: SparkSession, table: String): Seq[Commit] = {
    val all = commits(spark, table)
    val lastSquash = all.lastIndexWhere(_.tag == SquashTag)
    if (lastSquash < 0) all else all.drop(lastSquash)
  }

  /** Idempotent log append: if some commit already carries `tag`, this is
    * a no-op returning None (the re-delivered batch was already durable);
    * otherwise append `df` as a new delta commit. The foreachBatch body is
    * one line: `appendCommitted(spark, batchDf, table, s"batch=$id")`.
    * The duplicate-tag check reads every commit file — O(live commits),
    * which is exactly what periodic [[squash]] keeps small (after a
    * squash only the live span remains); an unsquashed log pays a
    * linearly growing check, the same pressure that motivates Delta's
    * checkpoints.
    */
  def appendCommitted(spark: SparkSession, df: DataFrame, table: String,
      tag: String): Option[Commit] = {
    require(tag != SquashTag && tag != "-", s"reserved tag: '$tag'")
    if (commits(spark, table).exists(_.tag == tag)) None
    else Some(writeAndCommit(spark, df, table, tag))
  }

  /** The log table's content: union of every commit since the last
    * squash. None = never committed. Read with `mergeSchema`, so
    * ADDITIVE schema evolution works the lakehouse way: a commit may add
    * columns, older generations surface them as null, and the next
    * [[squash]] bakes the widened schema into one generation. (Renames/
    * type changes are rewrites, not evolution — same rule as Delta.)
    */
  def readLog(spark: SparkSession, table: String): Option[DataFrame] = {
    val cs = logCommits(spark, table)
    if (cs.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true")
      .parquet(cs.map(genPath(table, _)): _*))
  }

  /** MERGE INTO for snapshot tables: apply a whole-row upsert/delete
    * changeset ([[graft.operators.Merge.mergeApply]]) to the current
    * generation and commit the result as the next one. On a
    * never-committed table the changeset's non-deleted rows ARE the
    * first snapshot. Readers are snapshot-isolated throughout (they hold
    * the previous pointer until the new one lands).
    */
  def mergeAndCommit(spark: SparkSession, table: String, changes: DataFrame,
      keys: Seq[String], deleteCol: String = "_deleted",
      tag: String = "-"): Commit = {
    val next = read(spark, table) match {
      case Some(cur) =>
        graft.operators.Merge.mergeApply(cur, changes, keys, deleteCol)
      case None => changes.filter(!org.apache.spark.sql.functions
        .col(deleteCol)).drop(deleteCol)
    }
    writeAndCommit(spark, next, table, tag)
  }

  /** Fold the log's live commits into ONE generation committed under
    * [[SquashTag]], then GC superseded history. Bounds both the commit
    * listing and the per-read file count — run it like any table
    * maintenance job. Readers are never disturbed: until the squash
    * pointer lands they union the old commits; after, they start at it.
    *
    * GC keeps the newest PRE-squash commit too: Structured Streaming can
    * only ever replay the LATEST batchId (its checkpoint is monotonic),
    * so preserving the commit that carries that batch's tag keeps
    * [[appendCommitted]]'s idempotence intact even when a squash lands
    * in the crash window between a batch's data commit and the stream's
    * checkpoint commit — without it, the replayed batch would re-append.
    */
  def squash(spark: SparkSession, table: String): Option[Commit] = {
    val cur = readLog(spark, table).getOrElse(return None)
    val c = writeAndCommit(spark, cur, table, SquashTag)
    gc(spark, table, keep = 2)
    Some(c)
  }

  /** Prune history: keep the newest `keep` commits (and their gen dirs)
    * — plus, always, every LIVE log commit (at/after the last squash; for
    * a snapshot table, whose newest commit supersedes all others, that
    * adds nothing beyond the newest) — delete everything older plus any
    * unreferenced gen dir and stale commit temp files. Deletes only —
    * idempotent and crash-safe. On a log table a LIVE STREAM appends to,
    * use `keep >= 2` (what [[squash]] itself does): `keep = 1` right
    * after a squash would drop the newest pre-squash commit, whose tag
    * is the replay guard for a batch caught in the data-commit /
    * checkpoint-commit crash window.
    * @return (commit files deleted, gen dirs deleted)
    */
  def gc(spark: SparkSession, table: String, keep: Int = 2): (Int, Int) = {
    require(keep >= 1, "must keep at least the live generation")
    val t = new Path(table)
    val fs = fsOf(spark, t)
    val cd = commitsDir(t)
    if (!fs.exists(cd)) return (0, 0)
    val all = fs.listStatus(cd).map(_.getPath.getName)
    val commitNames = all.filter(_.matches("v\\d{16}")).sortBy(_.drop(1).toLong)
    val stale = all.filter(n => n.startsWith(".") && n.endsWith(".tmp"))
    val parsed = commitNames.map(parseCommit(fs, cd, _))
    // a log table's live span must survive any `keep`: a squash commit
    // supersedes what precedes it, nothing supersedes what follows it
    val lastSquash = parsed.lastIndexWhere(_.tag == SquashTag)
    val liveFrom =
      if (parsed.isEmpty) 0
      else if (lastSquash >= 0) lastSquash
      else if (parsed.exists(_.tag != "-")) 0 // unsquashed log: all live
      else parsed.length - 1                  // snapshot: newest only
    val cut = math.min(math.max(0, commitNames.length - keep), liveFrom)
    val drop = commitNames.take(cut)
    val keptGens = parsed.drop(cut).map(_.gen).toSet
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

package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Cross-table ATOMIC commit — the multi-table transaction tier above
  * [[Generations]], closing the one-logical-action gap the reference's
  * failure path exposes: flag the catalog, publish the alert, ack
  * (`data_downloader.py:40-58`) must be all-or-nothing, but independent
  * per-table pointer publishes leave a crash window between them.
  * (Naming: this is a TABLE catalog in the Iceberg/Nessie sense — the
  * root of a lakehouse namespace; the harvest SOURCE catalog, the
  * reference's CSV of sources, is the unrelated
  * [[graft.sources.Catalog]].)
  *
  * Design (the Nessie / Iceberg-REST-catalog root-pointer model, built
  * from the same public primitive as [[Generations]]): a catalog root
  * directory holds tables as ordinary Generations tables plus ONE extra
  * pointer namespace, `_root/v{%016d}` — each root commit is a tiny
  * immutable file mapping every table name to the table version that is
  * catalog-visible. A transaction stages any number of table writes,
  * materializes each as a normal per-table generation commit, and then
  * publishes ONE root pointer naming all of them: single-object
  * creation, atomic on a filesystem (temp + same-directory rename) and
  * on S3 (conditional PUT) — exactly the [[Generations]] commit
  * argument, lifted one level.
  *
  * Visibility contract: CATALOG readers ([[readTable]], [[Txn.read]])
  * resolve through the newest root and are snapshot-isolated across ALL
  * tables at once — they can never observe table A's half of a
  * transaction without table B's. A crash after some per-table commits
  * but before the root publish leaves those versions catalog-invisible
  * (per-table history above the root reference — harmless, pruned by
  * [[Catalog.gc]] as retention rolls). Reading a member table DIRECTLY
  * via `Generations.read` bypasses the transactional boundary and may
  * see in-flight versions — same rule as Nessie vs. raw Iceberg
  * metadata: the catalog is the consistency point.
  *
  * Concurrency: optimistic at the ROOT. Two transactions race the next
  * root version; the rename loser re-reads the new head and (a) if the
  * winner touched none of the loser's FOOTPRINT — tables it wrote OR
  * read via [[Txn.read]]/[[Txn.merge]] — REBASES: merges the maps and
  * re-publishes, no work redone (the Nessie disjoint-commit merge);
  * (b) on overlap, [[transact]] re-runs the whole body against the new
  * base (bounded retries), so no committed write is ever built on a
  * stale read — reads are part of the conflict check precisely so that
  * read-A-write-B cannot rebase past a concurrent A-writer (write
  * skew). Per-table `expectedBase` CAS is deliberately NOT used
  * inside transactions — conflict detection lives at the root, the only
  * place cross-table consistency is defined.
  */
object Catalog {

  /** One root commit: the full table→version map visible at `version`.
    * Full-map (not delta) keeps resolution O(1 pointer read) — the map
    * is bounded by the number of TABLES, never by history.
    */
  final case class RootCommit(version: Long, tables: Map[String, Long],
      tag: String = "-")

  /** Thrown into [[transact]]'s retry loop when a concurrent root
    * commit overlaps this transaction's table set; escapes to the
    * caller only after `maxRetries` bodies in a row lost the race.
    */
  final class TxnConflictException(msg: String) extends RuntimeException(msg)

  private def rootDir(root: Path) = new Path(root, "_root")
  private def rootName(v: Long) = f"v$v%016d"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A member table's storage path. Names are constrained so they can
    * never collide with the `_root` namespace or escape the root dir.
    */
  def tablePath(root: String, name: String): String = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe table name: '$name'")
    new Path(root, name).toString
  }

  private def rootNames(fs: FileSystem, rd: Path): Array[String] =
    if (!fs.exists(rd)) Array.empty
    else fs.listStatus(rd).map(_.getPath.getName)
      .filter(_.matches("v\\d{16}")).sortBy(_.drop(1).toLong)

  private def parseRoot(fs: FileSystem, rd: Path, name: String): RootCommit = {
    val in = fs.open(new Path(rd, name))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val head = lines.head.trim.split(" ")
    val tables = lines.tail.filter(_.nonEmpty).map { l =>
      val p = l.trim.split(" ")
      p(0) -> p(1).toLong
    }.toMap
    RootCommit(head(0).toLong, tables, if (head.length > 1) head(1) else "-")
  }

  /** [[parseRoot]] tolerating a concurrent [[gc]]: a root file listed a
    * moment ago may be pruned before we open it — that is ordinary
    * retention progress, not an error, so it reads as None instead of
    * surfacing FileNotFoundException to a time-traveling reader.
    */
  private def parseRootOpt(fs: FileSystem, rd: Path,
      name: String): Option[RootCommit] =
    try Some(parseRoot(fs, rd, name))
    catch { case _: java.io.FileNotFoundException => None }

  /** Every root commit still on disk, version-ascending. Roots pruned by
    * a gc racing the listing are skipped, not thrown.
    */
  def roots(spark: SparkSession, root: String): Seq[RootCommit] = {
    val rd = rootDir(new Path(root))
    val fs = fsOf(spark, rd)
    rootNames(fs, rd).flatMap(parseRootOpt(fs, rd, _)).toSeq
  }

  /** The newest root commit (one pointer read), or None for a new
    * catalog. The newest root is never gc-eligible (`keepRoots >= 1`),
    * but a STALE listing can still name one that a concurrent gc pruned
    * after a newer publish — re-list and retry rather than throw.
    */
  def latestRoot(spark: SparkSession, root: String): Option[RootCommit] = {
    val rd = rootDir(new Path(root))
    val fs = fsOf(spark, rd)
    var attempt = 0
    while (attempt < 5) {
      attempt += 1
      val names = rootNames(fs, rd)
      if (names.isEmpty) return None
      parseRootOpt(fs, rd, names.last) match {
        case some @ Some(_) => return some
        case None => // vanished between list and open: list again
      }
    }
    throw new java.io.IOException(
      s"$root: newest root kept vanishing between list and open")
  }

  /** Catalog-consistent read: `name`'s content at the newest root.
    * None if the catalog has no root yet or the root doesn't carry the
    * table.
    */
  def readTable(spark: SparkSession, root: String,
      name: String): Option[DataFrame] =
    latestRoot(spark, root).flatMap(readTableAt(spark, root, name, _))

  /** Time travel at catalog grain: `name` as of a specific root commit
    * — every table read at the same root is the state of ONE atomic
    * commit. None if the root doesn't carry the table or retention
    * pruned the generation ([[gc]]'s keepRoots dial).
    */
  def readTableAt(spark: SparkSession, root: String, name: String,
      at: RootCommit): Option[DataFrame] =
    at.tables.get(name).flatMap(v =>
      Generations.readAt(spark, tablePath(root, name), v))

  /** The mutation scope handed to a [[transact]] body: snapshot reads
    * pinned at the transaction's base root, buffered writes
    * (read-your-own-writes), no durable effect until the single root
    * publish.
    */
  final class Txn private[Catalog] (spark: SparkSession, root: String,
      val base: Option[RootCommit]) {
    private[Catalog] val staged =
      scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
    // every table this txn READ from the base root — part of the
    // conflict footprint (see transact: read-write conflicts abort too)
    private[Catalog] val readSet =
      scala.collection.mutable.LinkedHashSet.empty[String]

    /** Staged content if this txn wrote `name`, else the base root's
      * snapshot — never a concurrent writer's in-flight version. The
      * read is recorded in the txn's conflict footprint. If the base
      * root REFERENCES the table but its generation was pruned (a
      * mis-dialed per-table gc run outside [[Catalog.gc]]'s protection),
      * this throws rather than return None — None means "table absent",
      * and conflating the two let a merge treat a populated table as
      * empty and commit only the changeset (silent data loss).
      */
    def read(name: String): Option[DataFrame] = {
      staged.get(name).orElse {
        readSet += name
        base.flatMap { rc =>
          rc.tables.get(name).map { v =>
            Generations.readAt(spark, tablePath(root, name), v).getOrElse(
              throw new IllegalStateException(
                s"$root/$name@v$v is referenced by root v${rc.version} but its " +
                  "generation is gone (pruned outside Catalog.gc?) — " +
                  "refusing to treat the table as empty; re-sync required"))
          }
        }
      }
    }

    /** Stage a full-snapshot replace of `name`. */
    def put(name: String, df: DataFrame): Unit = {
      tablePath(root, name) // validates the name
      staged(name) = df
    }

    /** Stage a MERGE (whole-row upsert/delete changeset, same contract
      * as [[Generations.mergeAndCommit]]) against [[read]]'s view.
      */
    def merge(name: String, changes: DataFrame, keys: Seq[String],
        deleteCol: String = "_deleted"): Unit =
      put(name, read(name) match {
        case Some(cur) =>
          graft.operators.Merge.mergeApply(cur, changes, keys, deleteCol)
        case None => changes.filter(!col(deleteCol)).drop(deleteCol)
      })
  }

  /** Run `body` and commit every table it staged in ONE atomic root
    * publish. The body may run more than once (it re-executes when a
    * concurrent overlapping transaction wins the root race), so it must
    * be a pure function of its [[Txn]] — side effects beyond txn.put /
    * txn.merge are the caller's to make idempotent.
    *
    * Commit sequence per attempt: materialize each staged DataFrame as
    * a normal per-table generation commit (data durable, catalog-
    * invisible), then CAS-publish the root mapping every table to its
    * new version. A crash anywhere before the root rename leaves the
    * catalog exactly at the previous root — no partial transaction is
    * ever visible, which is precisely the all-or-nothing the
    * reference's flag-catalog + publish-alert + ack failure path needs.
    */
  def transact(spark: SparkSession, root: String, tag: String = "-",
      maxRetries: Int = 5)(body: Txn => Unit): RootCommit = {
    require(!tag.contains(" ") && tag.nonEmpty, s"tag must be space-free: '$tag'")
    var attempt = 0
    while (true) {
      val base = latestRoot(spark, root)
      val txn = new Txn(spark, root, base)
      body(txn)
      val written = txn.staged.map { case (name, df) =>
        name -> Generations
          .writeAndCommit(spark, df, tablePath(root, name)).version
      }.toMap
      publishRoot(spark, root, base, written, txn.readSet.toSet, tag) match {
        case Some(rc) => return rc
        case None => // overlap: orphaned table versions are just
          // catalog-invisible history; redo the body on the new base
          attempt += 1
          if (attempt >= maxRetries) throw new TxnConflictException(
            s"$root: lost the root race to overlapping transactions $maxRetries times")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** CAS-publish `base.tables ++ written` as the next root. On a rename
    * collision: rebase over the winner when it touched none of the
    * transaction's FOOTPRINT — `written`'s tables AND `readTables`
    * (map-merge, no body re-run) — give up (None) when it did. Reads
    * count because a body that read A and wrote B derived B from A's
    * base snapshot: letting it rebase past a concurrent A-writer would
    * publish B built on a stale read (snapshot-isolation write skew) —
    * the r12 ADVICE finding. With reads in the overlap check the
    * detected conflicts are serializable-equivalent, matching the doc's
    * "no committed write is ever built on a stale read".
    */
  private def publishRoot(spark: SparkSession, root: String,
      base: Option[RootCommit], written: Map[String, Long],
      readTables: Set[String], tag: String,
      maxRebase: Int = 20): Option[RootCommit] = {
    val rd = rootDir(new Path(root))
    val fs = fsOf(spark, rd)
    fs.mkdirs(rd)
    var onto = base
    var rebase = 0
    while (rebase < maxRebase) {
      val version = onto.map(_.version).getOrElse(0L) + 1
      val tables = onto.map(_.tables).getOrElse(Map.empty) ++ written
      val body = (s"$version $tag" +:
        tables.toSeq.sortBy(_._1).map { case (n, v) => s"$n $v" })
        .mkString("\n") + "\n"
      val tmp = new Path(rd,
        s".${rootName(version)}.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
      val out = fs.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (Pointers.publishNew(fs, tmp, new Path(rd, rootName(version))))
        return Some(RootCommit(version, tables, tag))
      fs.delete(tmp, false)
      // collision: someone else published this root version first
      val head = latestRoot(spark, root)
      val disjoint = (written.keySet ++ readTables).forall { t =>
        head.flatMap(_.tables.get(t)) == onto.flatMap(_.tables.get(t))
      }
      if (!disjoint) return None
      onto = head // Nessie-style disjoint merge: keep our table versions
      rebase += 1
    }
    None
  }

  /** Catalog-wide scheduled maintenance — [[Generations.maintain]] for
    * every member table under kept-root PROTECTION, then a best-effort
    * root re-point, then catalog retention ([[gc]]): the one call an
    * operations schedule drives per catalog tick.
    *
    * Per table: the protect set is every version a kept root references,
    * so folds/compactions/GC can never break catalog time travel within
    * `keepRoots` commits. Maintenance commits (squash, compaction,
    * Z-order) are content-preserving, so after they land the newest root
    * is RE-POINTED at them in one CAS publish (tag `maintain`) — catalog
    * readers get the compacted layout immediately instead of after the
    * table's next transaction. The re-point only covers tables whose
    * root-referenced version WAS the newest commit before maintenance
    * (a root pointing below the head means catalog-invisible in-flight
    * versions exist above it — re-pointing would expose them), and it
    * yields to any concurrent transaction: on a publish conflict over
    * the same table the transaction's version wins and the re-point is
    * simply skipped (maintenance is an optimization; the next tick
    * folds again).
    */
  def maintain(spark: SparkSession, root: String, keepRoots: Int = 2,
      policy: Generations.MaintenancePolicy = Generations.MaintenancePolicy(),
      perTable: Map[String, Generations.MaintenancePolicy] = Map.empty)
      : Map[String, Generations.MaintenanceReport] = {
    require(keepRoots >= 1, "must keep the live root")
    val rd = rootDir(new Path(root))
    val fs = fsOf(spark, rd)
    val head = latestRoot(spark, root).getOrElse(
      return Map.empty) // empty catalog: nothing to maintain
    val names = rootNames(fs, rd)
    val kept = names.takeRight(keepRoots).flatMap(parseRootOpt(fs, rd, _))
    val reports = head.tables.map { case (name, rootV) =>
      val tp = tablePath(root, name)
      val protect = kept.flatMap(_.tables.get(name)).toSet
      val report = Generations.maintain(spark, tp,
        perTable.getOrElse(name, policy), protect)
      val latestAfter = Generations.latest(spark, tp).map(_.version)
      // Re-point ONLY across a provably content-preserving chain: every
      // version in (rootV, latestAfter] must be a commit THIS
      // maintenance run produced (versions are dense, so a concurrent
      // transaction in the window occupies a version ∉ produced and
      // vetoes the re-point — it would have exposed catalog-invisible
      // in-flight content). The previous guard sampled the head BEFORE
      // maintenance (latestBefore == rootV), a TOCTOU: a transaction
      // landing after the sample was folded into the maintenance
      // commit and re-pointed into visibility (r13 ADVICE).
      val produced = report.produced.toSet
      val repoint = latestAfter.exists(after => after > rootV &&
        (rootV + 1 to after).forall(produced.contains))
      (name, report, if (repoint) latestAfter else None)
    }
    val updates = reports.collect { case (n, _, Some(v)) => n -> v }.toMap
    if (updates.nonEmpty)
      publishRoot(spark, root, Some(head), updates, Set.empty, "maintain")
    gc(spark, root, keepRoots = keepRoots, keepPerTable = policy.keep,
      orphanGraceMs = policy.orphanGraceMs)
    reports.map { case (n, r, _) => n -> r }.toMap
  }

  /** Catalog retention: keep the newest `keepRoots` root pointers,
    * delete older ones and stale temps, then run per-table
    * [[Generations.gc]] PROTECTING every table version a kept root
    * references — so catalog time travel across `keepRoots` commits
    * always resolves, no matter how per-table history interleaved
    * (including catalog-invisible versions from crashed transactions,
    * which prune as ordinary superseded history once retention passes
    * them).
    */
  def gc(spark: SparkSession, root: String, keepRoots: Int = 2,
      keepPerTable: Int = 1,
      orphanGraceMs: Long = Generations.OrphanGraceMs): Unit = {
    require(keepRoots >= 1, "must keep the live root")
    val rp = new Path(root)
    val rd = rootDir(rp)
    val fs = fsOf(spark, rd)
    if (!fs.exists(rd)) return
    val all = fs.listStatus(rd).map(_.getPath.getName)
    val names = all.filter(_.matches("v\\d{16}")).sortBy(_.drop(1).toLong)
    val stale = all.filter(n => n.startsWith(".") && n.endsWith(".tmp"))
    val keptRoots = names.takeRight(keepRoots).flatMap(parseRootOpt(fs, rd, _))
    (names.dropRight(keepRoots) ++ stale)
      .foreach(n => fs.delete(new Path(rd, n), false))
    // every table any kept root references, plus on-disk member tables
    // no kept root references anymore (their history still prunes)
    val onDisk =
      if (!fs.exists(rp)) Array.empty[String]
      else fs.listStatus(rp).filter(_.isDirectory).map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
    (keptRoots.flatMap(_.tables.keys) ++ onDisk).distinct.foreach { name =>
      val protect = keptRoots.flatMap(_.tables.get(name)).toSet
      Generations.gc(spark, tablePath(root, name), keep = keepPerTable,
        orphanGraceMs = orphanGraceMs, protect = protect)
    }
  }
}

package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) table layout — the co-located JOIN
  * primitive at 100 TB.
  *
  * A key-equality join between two unbucketed tables shuffles BOTH
  * sides on every run; for a fact table that participates in the same
  * join daily, that is the single largest recurring network cost in the
  * pipeline. Persisting each side hash-partitioned by the join key
  * (Spark's `bucketBy` + `sortBy` layout: file `i` of each table holds
  * exactly the keys with `hash(key) % n == i`, pre-sorted) makes every
  * subsequent join, aggregation, or window on that key EXCHANGE-FREE —
  * the sort-merge join reads co-located buckets directly, paying the
  * shuffle once at write time and never again.
  *
  * This is deliberately the session-catalog form (`saveAsTable` with an
  * explicit path → an EXTERNAL table: data under the caller's root,
  * metadata in the catalog) because bucket metadata is what lets the
  * planner trust the layout; a bare parquet directory cannot carry it.
  * [[BucketedJoinSpec]] pins the contract: the join plan of two
  * same-bucket-count tables contains NO ShuffleExchange, and a groupBy
  * on the bucket key is likewise exchange-free on the partial side.
  *
  * Scale notes: pick `buckets` so one bucket of the LARGER table fits
  * an executor's read chunk (buckets ≈ table bytes / 128 MB, rounded to
  * the co-partitioned family's common count); both join sides must use
  * the SAME count (or integer multiples with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`). Skewed keys
  * skew buckets — salt the key before bucketing or leave the hot table
  * unbucketed and let AQE skew-split the shuffle instead.
  */
object Bucketed {

  /** Persist `df` hash-clustered by `key` into `n` buckets (one sorted
    * file per bucket) as external table `name` at `path`. The
    * repartition aligns write tasks with buckets (same murmur3 pmod),
    * so each bucket is ONE file instead of one per (input partition ×
    * bucket) — the r17 sf1 probe measured the unaligned write's
    * 256-file read at 4× the aligned one's.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, n: Int): Unit =
    df.repartition(n, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(n, key).sortBy(key).saveAsTable(name)

  /** Join two same-bucket-count tables on their bucket key, forced to
    * sort-merge (the broadcast path would mask the layout win) — reads
    * co-located buckets with no exchange on either side.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right).hint("merge"), key)

  /** Register `name` as an ephemeral catalog VIEW of a bucket-clustered
    * [[Generations]] table's LIVE span: a partitioned + `CLUSTERED BY`
    * catalog table whose `_gen` partitions each point at one committed
    * generation directory (`ALTER TABLE … ADD PARTITION … LOCATION`),
    * so the planner trusts the layout — the bucketed scan merges each
    * bucket's files ACROSS generations into one co-located partition
    * and a key-equality join plans zero exchanges even after append
    * commits (BucketedGenerationsSpec pins it; the lake_gen_bucketed_join
    * gate REQUIREs it).
    *
    * This is how "mutable table of record" and "exchange-free joinable"
    * become ONE table: the Generations commit log keeps snapshot
    * isolation, replay witnesses, time travel, stats skipping and
    * maintenance folds; the registration is a pure-metadata projection
    * of the committed span into the session catalog (re-run it per
    * session or after a commit — partitions registered here ARE the
    * snapshot, so a concurrent commit never moves a registered reader).
    * Catalog metadata is session-scoped and disposable; the table of
    * record is the directory + commit log, exactly as before.
    */
  def registerGenerations(spark: SparkSession, table: String,
      name: String, atVersion: Option[Long] = None): Unit = {
    // the name is interpolated into DDL below and the registration
    // DROPs it first: restrict to a bare identifier (no backticks, no
    // dots — this API owns the default database only)
    require(name.matches("[A-Za-z0-9_]+"),
      s"registration name must be a bare [A-Za-z0-9_]+ identifier: '$name'")
    val (key, n) = Generations.getBucketing(spark, table).getOrElse(
      throw new IllegalStateException(
        s"$table has no declared bucketing — setBucketing first"))
    // the span to project: live, or TIME TRAVEL to `atVersion` (the
    // log content as of that commit: everything from the newest
    // snapshot-kind commit ≤ v onward). Reach is gc's keep dial, like
    // readAt — a swept generation fails loudly here, not at scan time.
    val commits = atVersion match {
      case None => Generations.logCommits(spark, table)
      case Some(v) =>
        val upTo = Generations.commits(spark, table).filter(_.version <= v)
        require(upTo.exists(_.version == v),
          s"version $v was never committed to $table")
        val i = upTo.lastIndexWhere(Generations.isSnapshotCommit)
        val span = if (i < 0) upTo else upTo.drop(i)
        val fs = new org.apache.hadoop.fs.Path(table)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        span.foreach { c =>
          require(fs.exists(new org.apache.hadoop.fs.Path(
            Generations.genPath(table, c))),
            s"generation of version ${c.version} has been gc'd — " +
              "time travel reach is the gc keep dial")
        }
        span
    }
    require(commits.nonEmpty, s"$table has no committed content")
    val schema = Generations.readLog(spark, table).get.schema
    require(schema.fieldNames.contains(key),
      s"bucket key '$key' missing from $table's live schema")
    require(!schema.fieldNames.contains("_gen"),
      s"$table has a data column named _gen — it collides with the " +
        "registration's generation partition column")
    // qualified URIs throughout: the catalog resolves relative paths
    // against the warehouse dir, not the session CWD
    val tPath = new org.apache.hadoop.fs.Path(table)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(tPath)
    // re-registration replaces OUR OWN projection (same location); a
    // pre-existing catalog table rooted elsewhere is someone else's —
    // dropping a MANAGED table would delete its data, so refuse.
    // Session-catalog tableExists, NOT spark.catalog.tableExists: the
    // latter also matches a TEMP VIEW of the same name, for which
    // getTableMetadata then throws NoSuchTableException — a confusing
    // crash instead of the intended guidance (a temp view never shadows
    // a CREATE TABLE, so it is simply not our concern here).
    if (spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(name))) {
      val existing = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name))
      require(new org.apache.hadoop.fs.Path(existing.location).toString
          == qualified.toString,
        s"catalog already has a table '$name' at ${existing.location}, " +
          s"not a registration of $table — pick another name rather " +
          "than dropping it")
    }
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(
      s"CREATE TABLE `$name` (${schema.toDDL}, _gen STRING) USING parquet " +
        s"PARTITIONED BY (_gen) CLUSTERED BY (`$key`) SORTED BY (`$key`) " +
        s"INTO $n BUCKETS LOCATION '$qualified'")
    commits.foreach { c =>
      val gp = fs.makeQualified(
        new org.apache.hadoop.fs.Path(Generations.genPath(table, c)))
      spark.sql(s"ALTER TABLE `$name` ADD PARTITION (_gen='${c.gen}') " +
        s"LOCATION '$gp'")
    }
  }

  /** Re-project every session-catalog registration of `table` onto its
    * CURRENT live span — the post-maintenance refresh (r17 carried
    * item). A registration pins the generation set at registration
    * time; after a squash/compaction + gc the pinned dirs may be gone
    * and a long-lived session's scans fail loudly, forcing a
    * failure-then-reregister round trip. This finds the registrations
    * by LOCATION (the one thing this API sets on the tables it
    * creates) and re-runs [[registerGenerations]] for each. Returns
    * the refreshed names; call it right after
    * [[Generations.maintain]].
    */
  def refreshRegistrations(spark: SparkSession, table: String): Seq[String] = {
    val tPath = new org.apache.hadoop.fs.Path(table)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(tPath).toString
    val catalog = spark.sessionState.catalog
    val names = catalog.listTables("default").flatMap { ident =>
      // temp views ride the same listing but have no table metadata —
      // skip anything whose location can't be read
      scala.util.Try(catalog.getTableMetadata(ident)).toOption
        .flatMap(m => scala.util.Try(
          new org.apache.hadoop.fs.Path(m.location).toString).toOption)
        .filter(_ == qualified).map(_ => ident.table)
    }
    names.foreach(registerGenerations(spark, table, _))
    names
  }

  /** The registered live span as a frame (bucketed scan, `_gen`
    * dropped): [[registerGenerations]] + read, the one-call form.
    */
  def readGenerations(spark: SparkSession, table: String,
      name: String): DataFrame = {
    registerGenerations(spark, table, name)
    spark.table(name).drop("_gen")
  }

  /** TIME TRAVEL over the bucketed layout: the log content as of
    * commit `version`, registered and read bucketed — co-located joins
    * against a historical span plan exchange-free too.
    */
  def readGenerationsAt(spark: SparkSession, table: String, name: String,
      version: Long): DataFrame = {
    registerGenerations(spark, table, name, Some(version))
    spark.table(name).drop("_gen")
  }

  /** Exchanges the plan would execute — 0 for a co-located join. Read
    * from `executedPlan` (exchanges are inserted by EnsureRequirements
    * at preparation; `sparkPlan` predates them and always shows zero),
    * with the same line-counting rule as [[graft.ShuffleBudget]] so the
    * number agrees with the repo's shuffle-budget audits.
    */
  def exchangeCount(df: DataFrame): Int =
    graft.ShuffleBudget.countExchanges(
      df.queryExecution.executedPlan.toString)
}

package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Sorting a table by one column gives parquet min/max row-group pruning
  * on that column only — a second filter dimension reads every row group
  * the first admits (LayoutSkippingSpec). Interleaving the bits of both
  * columns into one Morton key and sorting by THAT gives each dimension
  * partial locality, so a 2-D box predicate prunes multiplicatively
  * instead of on one axis. This is the standard lakehouse Z-ORDER
  * clustering technique, built here from Spark bitwise built-ins only
  * (shiftleft / & / | — whole-stage-codegen'd, no UDF).
  *
  * At 100 TB: combine with `repartitionByRange(zvalue)` so file-level
  * min/max prune first, then row-group stats within files; the write
  * stays a single range shuffle.
  */
object Layout {

  /** Spread the low 16 bits of x to even bit positions (0→0, 1→2, …,
    * 15→30) via the classic mask-and-shift doubling steps.
    */
  def spread16(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton key: bits of `a` at even positions, `b` at odd. Inputs
    * must already be scaled to 16-bit range (callers bucket/clamp first).
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** N-dimensional Morton key: bit j of column i lands at position
    * j·n + i (round-robin interleave), so every dimension keeps the same
    * partial locality — real lakehouse Z-ORDER takes N cluster columns,
    * not 2. Inputs must already be scaled to `bitsPerCol` bits (callers
    * bucket/clamp first) and n·bitsPerCol must fit a positive long.
    * `zValueN(Seq(a, b), 16)` equals [[zValue2]] bit-for-bit (a even
    * positions, b odd). Still nothing but codegen'd bitwise built-ins —
    * n·bitsPerCol shift/mask terms OR-folded, evaluated once per row at
    * write time.
    */
  def zValueN(cols: Seq[Column], bitsPerCol: Int = 16): Column = {
    val n = cols.size
    require(n >= 1 && bitsPerCol >= 1 && n * bitsPerCol <= 62,
      s"need 1 <= n*bitsPerCol <= 62, got n=$n bitsPerCol=$bitsPerCol")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bitsPerCol
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Clustering-quality report: what file-level min/max pruning would see
    * if the table were laid out linearly (sorted by x) vs Z-ordered, for
    * a 2-D key already bucketed to [0, domain). Files are VALUE-range
    * bins (file = key·nFiles/keyspace — the deterministic analog of
    * [[writeZOrdered]]'s `repartitionByRange`), so the whole report is
    * two partial-aggregable shuffles and no global sort: rows → per-file
    * min/max spans → per-layout summary. `est_files_x/y` is the expected
    * number of files a uniform point filter on that dimension admits
    * (Σ span/domain) — the number a 100 TB scan actually reads after
    * pruning; `row_skew` = max/avg rows per file says whether the curve
    * kept the write balanced.
    *
    * @return (layout ∈ {linear, zorder}, n_files, avg_span_x, avg_span_y,
    *         est_files_x, est_files_y, row_skew), 2 rows.
    */
  def clusteringStats(df: DataFrame, xCol: Column, yCol: Column,
      nFiles: Int, domain: Int = 256): DataFrame = {
    // The z-side binning divides by domain² as the Morton key space, which
    // is exact only when domain is a power of two (otherwise the key of
    // (domain-1, domain-1) exceeds domain² and file ids spill past nFiles,
    // skewing the report — e.g. domain=100 puts (99,99) at 16383 > 10000).
    require(domain > 0 && (domain & (domain - 1)) == 0,
      s"domain must be a power of two (Morton key space = domain^2), got $domain")
    val keyed = df.select(xCol.cast("long").as("bx"), yCol.cast("long").as("by"))
      .withColumn("z", zValue2(col("bx"), col("by")))
    val assigned = keyed.select(col("bx"), col("by"),
      explode(array(
        struct(lit("linear").as("layout"),
          floor(col("bx") * nFiles / domain).as("file")),
        struct(lit("zorder").as("layout"),
          floor(col("z") * nFiles / (domain.toLong * domain)).as("file"))))
        .as("a"))
      .select(col("bx"), col("by"), col("a.layout").as("layout"),
        col("a.file").as("file"))
    val perFile = assigned
      .groupBy(col("layout"), col("file"))
      .agg((max(col("bx")) - min(col("bx")) + 1).as("span_x"),
        (max(col("by")) - min(col("by")) + 1).as("span_y"),
        count(lit(1)).as("n_rows"))
    // all inputs are integer sums/counts (exact at any plan order), so
    // the derived ratios are deterministic doubles — no snapping needed
    perFile
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        (sum(col("span_x")).cast("double") / count(lit(1))).as("avg_span_x"),
        (sum(col("span_y")).cast("double") / count(lit(1))).as("avg_span_y"),
        (sum(col("span_x")).cast("double") / domain).as("est_files_x"),
        (sum(col("span_y")).cast("double") / domain).as("est_files_y"),
        (max(col("n_rows")).cast("double") /
          (sum(col("n_rows")).cast("double") / count(lit(1)))).as("row_skew"))
      .orderBy("layout")
  }

  /** Write `df` Z-clustered on two 16-bit-ranged columns: range-partition
    * then sort-within-partitions by the Morton key, so both file-level
    * and row-group-level min/max statistics align with the curve.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 1, options: Map[String, String] = Map.empty): Unit =
    writeZOrderedN(df, Seq(colA, colB), path, numFiles, options)

  /** [[writeZOrdered]] for N cluster columns ([[zValueN]] key; bit budget
    * split evenly, capped at 16 bits per column).
    */
  def writeZOrderedN(df: DataFrame, colNames: Seq[String], path: String,
      numFiles: Int = 1, options: Map[String, String] = Map.empty,
      bitsPerCol: Int = 16): Unit =
    zOrdered(df, colNames, numFiles, bitsPerCol)
      .write.options(options).parquet(path)

  /** The Z-clustering transform itself: Morton key → range partition →
    * sort within partitions → drop key. Pure plan (one range shuffle);
    * callers pick the sink.
    */
  def zOrdered(df: DataFrame, colNames: Seq[String], numFiles: Int,
      bitsPerCol: Int = 16): DataFrame =
    df.withColumn("_z", zValueN(colNames.map(col), bitsPerCol))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")

  /** `OPTIMIZE ... ZORDER BY (cols)` for a [[Generations]] table — the
    * lakehouse maintenance op that joins the layout technique above to
    * the pointer-file commit protocol: rewrite the table's LIVE content
    * ([[Generations.readLog]] — the newest generation for a snapshot
    * table, the folded log span for a log table) Z-clustered on
    * `colNames`, commit it as one new snapshot-kind generation, then GC
    * superseded history. Readers are snapshot-isolated throughout and
    * pruning evidence survives reading through `Generations.read` — the
    * commit changes WHICH directory the pointer names, not how parquet
    * stats work. Optimistic concurrency like every other read-modify-
    * write commit: a concurrent append aborts-and-redoes the rewrite.
    *
    * File width: ceil(live bytes / targetBytes), so file-level min/max
    * pruning and row-group pruning both align with the curve. Inputs
    * must already be scaled to `bitsPerCol` bits (same contract as
    * [[writeZOrderedN]]).
    *
    * @return the optimize commit, or None for a never-committed table
    */
  def optimizeZOrder(spark: org.apache.spark.sql.SparkSession, table: String,
      colNames: Seq[String], targetBytes: Long = 128L * 1024 * 1024,
      bitsPerCol: Int = 16, options: Map[String, String] = Map.empty,
      maxRetries: Int = 5): Option[Generations.Commit] = {
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (true) {
      val base = Generations.latest(spark, table)
        .map(_.version).getOrElse(return None)
      val span = Generations.logCommits(spark, table)
      val bytes = span.map { c =>
        fs.listStatus(new org.apache.hadoop.fs.Path(
            Generations.genPath(table, c)))
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
          .map(_.getLen).sum
      }.sum
      val numFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val zdf = zOrdered(Generations.readLog(spark, table).get, colNames,
        numFiles, bitsPerCol)
      try {
        val c = Generations.writeAndCommit(spark, zdf, table,
          expectedBase = Some(base), options = options)
        Generations.gc(spark, table, keep = 2)
        return Some(c)
      } catch {
        case _: Generations.CommitConflictException if attempt < maxRetries - 1 =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Schemas

/** Source-catalog reader/writer (reference S1-S3 + E1, SURVEY.md §2.1).
  *
  * One quote-aware CSV parser with a declared schema replaces the
  * reference's two inconsistent parsers (naive `split(',')` at
  * `data_harvester.py:28` vs. the `csv` module at `data_downloader.py:42`)
  * — decision recorded in SURVEY.md §1.3. Rows are `\r\n`-separated
  * (`data_harvester.py:27`); the header row is consumed by the parser
  * instead of leaking through the Active filter.
  */
object Catalog {

  /** The default fixture shipped with the repo (FIXTURES.md §1). */
  val fixturePath = "/root/repo/fixtures/sources.csv"

  def read(spark: SparkSession, path: String = fixturePath): DataFrame =
    spark.read
      .option("header", "true")
      .option("lineSep", "\r\n")
      .option("quote", "\"")
      .schema(Schemas.catalog)
      .csv(path)

  /** [[read]] with corrupt-row capture: rows the quote-aware parser can't
    * bind to the declared schema surface in `_corrupt_record` (raw line)
    * instead of silently becoming all-null rows — at 100 TB ingest the
    * malformed minority must be routable to the alert path (E2), never
    * silently dropped. Callers split on `_corrupt_record IS NULL`.
    */
  def readAudited(spark: SparkSession, path: String = fixturePath): DataFrame =
    spark.read
      .option("header", "true")
      .option("lineSep", "\r\n")
      .option("quote", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(Schemas.catalog.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .csv(path)

  /** Overwrite the catalog (E1 read-modify-overwrite). Single-writer by
    * contract — the reference has the same lost-update exposure
    * (SURVEY.md §7.3). Coalesce(1): the catalog is broadcast-sized by
    * design (thousands of rows), never a distributed dataset.
    */
  def overwrite(df: DataFrame, path: String): Unit =
    df.coalesce(1).write
      .mode("overwrite")
      .option("header", "true")
      .option("lineSep", "\r\n")
      .csv(path)

  /** E1 applied to the LIVE catalog file: materialize the updated catalog
    * to a temp dir FIRST (the update plan lazily reads `path` — writing
    * in place before materializing would read-through-truncate), then
    * swap the single part file over `path`. Single-writer by contract
    * (SURVEY.md §7.3); later batches re-read the swapped file, so flags
    * from earlier batches accumulate instead of being recomputed from the
    * original catalog.
    *
    * Commit posture: these are SINGLE-FILE renames — atomic on a real
    * filesystem, which is this method's target (mirrors the reference's
    * local catalog rewrite). On an S3-class store the right form is
    * simpler, not harder: one overwrite PUT of the rewritten object
    * (`put_object`, exactly what the reference's own S3 path does at
    * `data_downloader.py:169`) — a PUT is all-or-nothing, so the aside/
    * restore dance is unnecessary there. Multi-file TREES are the case
    * that needs [[graft.sinks.Generations]]; a one-object catalog does
    * not.
    */
  def replaceInPlace(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(path + ".tmp-rewrite")
    overwrite(df, tmp.toString)
    val fs = tmp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    val target = new Path(path)
    // Crash-safe swap: the old catalog moves ASIDE (not deleted) before
    // the new one moves in, so at every instant at least one complete
    // catalog exists on disk (`path` or `path.bak`) — a kill between the
    // renames is recoverable from .bak, never a total loss.
    val bak = new Path(path + ".bak")
    fs.delete(bak, true)
    if (fs.exists(target)) fs.rename(target, bak)
    fs.rename(part, target)
    fs.delete(bak, true)
    fs.delete(tmp, true)
  }
}

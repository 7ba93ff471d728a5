package graft.model

import org.apache.spark.sql.types._

/** Engine data model, derived from the reference's implicit shapes.
  *
  * The reference's only structured table is a positional, undeclared
  * 10-column CSV (`data_harvester.py:28-37`, `data_downloader.py:43-46`);
  * the inter-stage record is a flat all-string JSON task message
  * (`data_harvester.py:37`, `data_downloader.py:216`). Here both get
  * explicit Spark schemas (SURVEY.md §1).
  */
object Schemas {

  /** Source catalog: the reference references indices 0..9; cols 3,5,6 are
    * never read but must be carried for positional fidelity (FIXTURES.md §1).
    */
  val catalog: StructType = StructType(Seq(
    StructField("id", StringType),        // col 0 — join key for error updates
    StructField("url", StringType),       // col 1 — templated fetch URL
    StructField("interval", StringType),  // col 2 — schedule bucket
    StructField("col3", StringType),      // col 3 — unused, carried
    StructField("active", IntegerType),   // col 4 — 0/1/2 (2 = broken)
    StructField("col5", StringType),      // col 5 — unused, carried
    StructField("col6", StringType),      // col 6 — unused, carried
    StructField("type", StringType),      // col 7 — fetch strategy enum
    StructField("pattern", StringType),   // col 8 — glob / output name, templated
    StructField("utc", IntegerType)       // col 9 — UTC offset hours
  ))

  /** Task message (queue record). All values are strings in the reference
    * (`data_harvester.py:37`); `attempts` is the engine's retry counter for
    * the DLQ model (SURVEY.md §2.1 E4).
    */
  val task: StructType = StructType(Seq(
    StructField("ID", StringType),
    StructField("URL", StringType),
    StructField("TYPE", StringType),
    StructField("PATTERN", StringType),
    StructField("UTC", StringType),
    StructField("attempts", IntegerType)
  ))

  /** Corrupt-record capture column for task reads. Without it, Spark's
    * PERMISSIVE JSON mode turns a malformed queue line into an all-null
    * PHANTOM TASK that flows into the pipeline (routes to the
    * unknown-type error path with null ID — an alert nobody can act on).
    * Reading with this schema + `columnNameOfCorruptRecord` lets every
    * consumer split good rows from quarantinable raw lines instead.
    */
  val taskCorruptCol = "_corrupt"
  val taskWithCorrupt: StructType =
    StructType(task.fields :+ StructField(taskCorruptCol, StringType))

  /** Alert (error notification) record — corrected well-formed shape of the
    * reference's hand-built payload (`data_downloader.py:52-56`).
    */
  val alert: StructType = StructType(Seq(
    StructField("ID", StringType),
    StructField("URL", StringType),
    StructField("REASON", StringType),
    StructField("MESSAGE", StringType)
  ))

  /** Valid fetch-strategy enum (`data_downloader.py:217-226`). Anything else
    * routes to the error side-output (`data_downloader.py:228`).
    */
  val strategies: Seq[String] =
    Seq("LINKS", "LINKS_OVERWRITE", "DIRECT", "DIRECT_FTP", "FTP_FILES")

  /** Sink prefix per strategy (`data_downloader.py:104-107,132,170,195`). */
  val sinkPrefix: Map[String, String] = Map(
    "LINKS"           -> "LINK",
    "LINKS_OVERWRITE" -> "LINKS_OVER",
    "DIRECT"          -> "LINKS_DIRECT",
    "DIRECT_FTP"      -> "FTP_FILE",
    "FTP_FILES"       -> "FTP_FILES"
  )
}

/** Typed task record for Dataset use. */
case class Task(
    ID: String,
    URL: String,
    TYPE: String,
    PATTERN: String,
    UTC: String,
    attempts: Int = 0)

/** A fetched artifact: opaque bytes keyed by sink path
  * (`data_downloader.py:62-70`).
  */
case class Artifact(key: String, body: Array[Byte])

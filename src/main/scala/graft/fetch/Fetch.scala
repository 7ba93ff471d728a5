package graft.fetch

import java.io.ByteArrayOutputStream
import java.net.{URI, URLConnection}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

import graft.model.Task

/** Fetch kernels (reference X1/X5/X8/X9, `data_downloader.py:62-70,83,152`).
  *
  * Side-effecting and non-deterministic, so they are deliberately NOT
  * Catalyst expressions: Catalyst may duplicate/reorder expressions past
  * filters, which must never happen to a network fetch (SURVEY.md §4.3).
  * They live in `mapPartitions` over typed Datasets — one connection-ish
  * context per partition, streamed row-at-a-time, never collected to the
  * driver. Retries under speculative execution stay safe because the sink
  * is PUT-style idempotent (key = strategy/name).
  *
  * Tests drive these with `file://` URLs only — no network (SURVEY §5.2).
  */
object Fetch {

  /** One fetched page/listing per task: (task, text | error). */
  case class PageResult(task: Task, text: String, error: String)

  /** One fetched artifact: (task, sink key, body | error). */
  case class FileResult(ID: String, URL: String, key: String,
      body: Array[Byte], error: String)

  /** `urllib.request.urlopen(url).read()` equivalent: whole-body read.
    * The reference reads bodies fully into memory (`data_downloader.py:69`)
    * — kept, but bounded per-partition rather than per-lambda.
    */
  def readBytes(url: String): Array[Byte] = {
    val conn: URLConnection = new URI(url).toURL.openConnection()
    conn.setConnectTimeout(15000)
    conn.setReadTimeout(60000)
    val in = conn.getInputStream
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def readText(url: String): String =
    new String(readBytes(url), "UTF-8")

  /** Fetch the page/listing text for each task (X1/X6 head of the LINKS
    * and FTP_FILES branches). Errors are captured per-row, not thrown —
    * they feed the E1/E2 error path.
    */
  def fetchPages(tasks: Dataset[Task]): Dataset[PageResult] = {
    implicit val enc = Encoders.product[PageResult]
    tasks.mapPartitions { it =>
      it.map { t =>
        try PageResult(t, readText(t.URL), null)
        catch { case e: Exception => PageResult(t, null, errMsg(e)) }
      }
    }
  }

  /** Download each (ID, URL, key) row (X9 kernel). */
  def fetchFiles(df: DataFrame): Dataset[FileResult] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("ID", "URL", "key").as[(String, String, String)]
      .mapPartitions { it =>
        it.map { case (id, url, key) =>
          try FileResult(id, url, key, readBytes(url), null)
          catch { case e: Exception => FileResult(id, url, key, null, errMsg(e)) }
        }
      }
  }

  private def errMsg(e: Exception): String = {
    val m = if (e.getMessage == null) e.getClass.getSimpleName else e.getMessage
    s"${e.getClass.getSimpleName}: $m"
  }
}

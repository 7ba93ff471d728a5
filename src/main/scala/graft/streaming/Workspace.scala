package graft.streaming

import java.nio.file.{Files, Paths}

/** Workspace provisioning (reference L1/L3: bucket + `in/ processing/
  * done/` folder lifecycle, `market_data_downloader_create_bucket.py:
  * 54-112`, `market_data_downloader_create_folders.py:10-29`). Idempotent
  * mkdirs; the S3-event registration of the reference becomes simply
  * *starting* the streaming source on `in/` (L2, SURVEY.md §3.3).
  */
object Workspace {

  val dirs = Seq("in", "processing", "done", "queue", "dead_letter", "alerts",
    "out")

  def provision(root: String): Unit =
    dirs.foreach(d => Files.createDirectories(Paths.get(root, d)))

  /** L3: test-artifact cleanup by prefix
    * (`market_data_downloader_clean_test_files.py:34-43`).
    */
  def cleanPrefix(root: String, prefix: String): Unit = {
    val dir = Paths.get(root, prefix)
    if (Files.isDirectory(dir)) {
      val s = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala
          .filter(_ != dir)
          .foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
  }
}

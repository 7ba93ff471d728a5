package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-repo mirror of the driver-side leak detectors, enforced on every
  * `sbt test` so the invariant holds between driver runs: this library
  * derives from PUBLIC knowledge only — no internal package imports, no
  * non-placeholder URLs, no cloud bucket URIs, no credential shapes, no
  * chat-workspace links, no undeclared environment variables. Patterns
  * are shape-based (the repo must not even contain the strings a
  * name-based list would).
  */
class LeakAuditSpec extends AnyFunSuite {

  private def scalaFiles: Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get("src"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("LeakAuditSpec.scala")) // holds the patterns
      .toSeq
  }

  private def read(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)

  // Top-level roots a vendored client or company artifact would live
  // under. Relative imports (import spark.implicits._) and the public
  // surface (graft/java/javax/scala/org.apache.*/org.scalatest/
  // org.scalacheck) pass; any other reverse-domain import fails.
  private val companyRoots = Set("com", "io", "net", "ai", "software",
    "co", "cloud", "dev", "build", "corp")
  private val orgAllowed = Seq("org.apache.spark", "org.apache.hadoop",
    "org.apache.logging", "org.apache.parquet", // parquet-mr ships in Spark's jars (FileStats footer reads)
    "org.scalatest", "org.scalacheck")

  test("imports resolve only against public allowlisted roots") {
    val offenders = scalaFiles.flatMap { p =>
      read(p).linesIterator.zipWithIndex.collect {
        case (l, i) if l.trim.startsWith("import ") => (l.trim, i)
      }.filter { case (l, _) =>
        val target = l.stripPrefix("import ").trim
        val root = target.takeWhile(_ != '.')
        companyRoots.contains(root) ||
          (root == "org" && !orgAllowed.exists(target.startsWith))
      }.map { case (l, i) => s"$p:${i + 1}: $l" }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no real-world URLs, bucket URIs, credential shapes, or workspace links") {
    // hosts in test fixtures are placeholders (h, x.y, ex.com,
    // *.example); a URL whose host ends in a real TLD is a leak
    val realTld = Set("com", "org", "net", "io", "ai", "dev", "co", "cloud", "app")
    val urlHostOk = Set("ex.com", "example.com", "example.org", "localhost")
    val url = """https?://([^/"'\s)]+)""".r
    val patterns: Seq[(String, String => Boolean)] = Seq(
      "bucket-uri" -> (s => Seq("s3://", "s3a://", "s3n://", "gs://",
        "abfs://", "wasb://").exists(s.contains)),
      "aws-key-id" -> (s => """AKIA[0-9A-Z]{16}""".r.findFirstIn(s).isDefined),
      "workspace-link" -> (s => s.contains("hooks.slack.com") ||
        s.contains("slack.com/archives") || s.contains("app.slack.com")),
      "credential-assign" -> (s =>
        """(?i)(api_key|apikey|secret_key|access_key|auth_token|password)\s*[:=]\s*"[A-Za-z0-9+/_\-]{16,}"""".r
          .findFirstIn(s).isDefined),
      "real-url" -> (s => url.findAllMatchIn(s).exists { m =>
        val host = m.group(1).toLowerCase
        val tld = host.split('.').lastOption.getOrElse("")
        host.contains(".") && realTld.contains(tld) && !urlHostOk.contains(host)
      })
    )
    val offenders = scalaFiles.flatMap { p =>
      val text = read(p)
      patterns.collect { case (name, hit) if hit(text) => s"$p: $name" }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("environment variables are limited to the declared SPARK_GRAFT_ namespace") {
    val env = """sys\.env[^\n"]*"([A-Za-z0-9_]+)"""".r
    val offenders = scalaFiles.flatMap { p =>
      env.findAllMatchIn(read(p))
        .map(_.group(1))
        .filterNot(_.startsWith("SPARK_GRAFT_"))
        .map(v => s"$p: sys.env access to $v")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}

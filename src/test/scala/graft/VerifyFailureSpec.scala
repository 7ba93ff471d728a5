package graft

import org.apache.spark.sql.functions._

/** r7 regression guard: a query whose DataFrame fails to BUILD (analysis
  * error) or to EXECUTE must surface as an explicit failure artifact —
  * an `_error` marker in its dump dir plus a failed_queries.json row —
  * never silently vanish from the correctness dump (which is how four
  * broken queries masqueraded as a fully green board in r7).
  */
class VerifyFailureSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  test("a broken query leaves an _error marker and a failed_queries row; good queries still dump") {
    val out = java.nio.file.Files.createTempDirectory("verify-fail").toString
    val failed = Verify.dump(spark, "/root/testdata/sf0.001", out, Seq(
      "good_probe" -> ((s, _) => s.range(3).select(col("id"))),
      "broken_probe" -> ((s, dir) =>
        // analysis failure at build time, like the r7 NTZ break
        s.read.parquet(s"$dir/documents.parquet").select(col("no_such_col")))
    ))
    assert(failed.map(_._1) === Seq("broken_probe"))
    // good query: real parquet, no marker
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/good_probe/_SUCCESS")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/good_probe/_error")))
    // broken query: marker present, with the failure message
    val marker = java.nio.file.Paths.get(s"$out/broken_probe/_error")
    assert(java.nio.file.Files.exists(marker))
    assert(java.nio.file.Files.readString(marker).contains("no_such_col"))
    // machine-readable failure list names exactly the broken query
    val fj = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/failed_queries.json"))
    assert(fj.contains("\"broken_probe\""))
    assert(!fj.contains("good_probe"))
  }

  test("a stale green dump is cleared when the query breaks") {
    val out = java.nio.file.Files.createTempDirectory("verify-stale").toString
    // round 1: green
    Verify.dump(spark, "/root/testdata/sf0.001", out, Seq(
      "q" -> ((s, _) => s.range(3).select(col("id")))))
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(s"$out/q"))
      .iterator().asScala.exists(_.getFileName.toString.startsWith("part-")))
    // round 2: same query now broken — the old parquet must not survive
    Verify.dump(spark, "/root/testdata/sf0.001", out, Seq(
      "q" -> ((s, _) => s.range(3).select(col("nope")))))
    val left = java.nio.file.Files.list(java.nio.file.Paths.get(s"$out/q"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    assert(!left.exists(_.startsWith("part-")), left.mkString(", "))
    assert(left.contains("_error"))
  }
}

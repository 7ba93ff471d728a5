package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{Fixtures, SparkSpec}
import graft.sources.Catalog

/** Golden tests for the flagship harvest pipeline (SURVEY.md §5.2.4):
  * fixture catalog at a pinned timestamp → exact expected task set.
  */
class HarvestSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly harvest at 2026-08-12 09:30 UTC yields the expected task set") {
    val got = Harvest.tasks(Catalog.read(spark), ts(Fixtures.runTs), "hourly")
      .orderBy("ID").collect()
    assert(got.map(_.getString(0)).toSeq ===
      Seq("src-001", "src-003", "src-005", "src-008", "src-009"))
    val bySrc = got.map(r => r.getString(0) -> r).toMap
    // +10h offset: local clock 19:30 the same day; holes expanded.
    assert(bySrc("src-001").getString(1) === "http://host.example/reports/2026/08/")
    // header row is consumed by the parser, not filtered by luck.
    assert(!got.map(_.getString(0)).contains("ID"))
    // inactive (0) and broken (2) sources excluded; BOGUS type retained
    // (harvester does not validate TYPE — data_downloader.py:228 errors).
    assert(bySrc("src-009").getString(2) === "BOGUS_TYPE")
    // quoted CSV field with embedded comma parsed whole.
    assert(bySrc("src-008").getString(1) === "http://host.example/a,b/")
  }

  test("minutely harvest expands {hour}{minute} with negative offset") {
    val got = Harvest.tasks(Catalog.read(spark), ts(Fixtures.runTs), "minutely")
      .collect()
    // -11h: 2026-08-12 09:30 UTC → 2026-08-11 22:30 local
    assert(got.map(_.getString(1)).toSeq === Seq("http://host.example/minute/2230/"))
  }

  test("lastmonth: corrected vs legacy reference bug (data_harvester.py:34)") {
    val jan = ts("2026-01-15 02:05:00")
    val nov = ts("2026-11-15 02:05:00")
    val dec = ts("2026-12-15 02:05:00")
    def pattern(runTs: Timestamp, legacy: Boolean): String =
      Harvest.tasks(Catalog.read(spark), runTs, "monthly", legacy)
        .select("PATTERN").collect().head.getString(0)
    // corrected: January → 12 (previous December), zero-padded
    assert(pattern(jan, legacy = false) === "em_12.zip")
    assert(pattern(nov, legacy = false) === "em_10.zip")
    // legacy bug: '0' + (month-1) → Jan "00", Nov "010", Dec "011"
    assert(pattern(jan, legacy = true) === "em_00.zip")
    assert(pattern(nov, legacy = true) === "em_010.zip")
    assert(pattern(dec, legacy = true) === "em_011.zip")
  }

  test("task JSON matches the reference message shape (data_harvester.py:37)") {
    val j = Harvest.taskMessages(Catalog.read(spark), ts(Fixtures.runTs), "hourly")
      .filter(col("ID") === "src-003").select("task_json").collect().head.getString(0)
    assert(j === """{"ID":"src-003","URL":"ftp://ftp.example/pub/","TYPE":"FTP_FILES","PATTERN":"data_*.zip","UTC":"-5"}""")
  }
}

package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ORC as an interchange format: roundtrip fidelity and predicate
  * pushdown parity with the parquet path (Spark ships the vectorized ORC
  * reader in-box, so catalogs/sinks can be ORC-backed with no code
  * change — format choice is a `.format()` string in every graft sink).
  */
class OrcSourceSpec extends SparkSpec {

  test("ORC roundtrip preserves rows; filters reach the ORC scan") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-orc").resolve("docs_orc").toString
    val rows = (1L to 100L).map(i => (i, s"doc number $i", i % 5))
      .toDF("doc_id", "text", "lang_id")
    rows.write.orc(out)

    val back = spark.read.orc(out)
    assert(back.count() === 100)
    assert(back.agg(sum("doc_id")).head().getLong(0) === (1L to 100L).sum)

    val filtered = back.filter(col("doc_id") === 7L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("EqualTo(doc_id,7)"),
      s"expected doc_id filter pushed to the ORC scan:\n$plan")
    assert(filtered.head().getString(1) === "doc number 7")
  }

  test("partitioned ORC write prunes directories like parquet") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-orc").resolve("part_orc").toString
    Seq((1L, "a", "en"), (2L, "b", "de"), (3L, "c", "en"))
      .toDF("doc_id", "text", "lang")
      .write.partitionBy("lang").orc(out)
    val scan = spark.read.orc(out).filter(col("lang") === "de")
    // collect() (not count()) so the metrics belong to THIS plan instance
    assert(scan.collect().length === 1)
    val leaves = scan.queryExecution.executedPlan.collectLeaves()
    val files = leaves.head.metrics.get("numFiles").map(_.value)
    assert(files.contains(1L), s"expected 1-of-2 partition dirs read: $files")
  }
}

package graft

import org.apache.spark.sql.functions._

/** The r20 hardening contract for [[Tables]]' metadata caches (r19
  * ADVICE): cache keys are a recursive LEAF-FILE fingerprint resolved
  * through the Hadoop FileSystem, so (a) rewriting a table in place —
  * new part files under the same directory path — re-infers the schema
  * and re-counts instead of serving the stale entry, and (b) a
  * partitioned (nested-directory) layout counts its leaf files instead
  * of silently returning 0 and sizing operators to one cell.
  */
class TablesCacheSpec extends SparkSpec {
  import spark.implicits._

  test("in-place table rewrite invalidates the schema cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tabcache")
      .toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(dir)
    assert(Tables.read(spark, dir).schema.fieldNames.toSeq == Seq("id", "s"))
    assert(Tables.parquetRowCount(spark, dir) == 2L)
    // rewrite IN PLACE under the same path: different schema, new part
    // files (overwrite replaces the directory contents — the leaf-file
    // fingerprint changes even though the path does not)
    Seq((10L, 1.5, "x"), (20L, 2.5, "y"), (30L, 3.5, "z"))
      .toDF("id", "v", "s").write.mode("overwrite").parquet(dir)
    assert(Tables.read(spark, dir).schema.fieldNames.toSeq ==
      Seq("id", "v", "s"), "stale cached schema served after rewrite")
    assert(Tables.parquetRowCount(spark, dir) == 3L,
      "stale cached row count served after rewrite")
  }

  test("partitioned layout: rowCount counts nested leaf files, never 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tabpart")
      .toString + "/t"
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    assert(Tables.parquetRowCount(spark, dir) == 3L)
    // data readable under the cached (partition-aware) schema too
    assert(Tables.read(spark, dir).count() == 3L)
  }

  test("rowCount throws on a directory with no parquet data files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tabempty")
      .toString
    intercept[IllegalArgumentException] {
      Tables.parquetRowCount(spark, dir)
    }
  }
}

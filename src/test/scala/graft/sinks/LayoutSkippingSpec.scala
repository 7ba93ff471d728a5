package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data-layout row-group skipping: sorting within files by the dominant
  * filter column lets parquet min/max statistics prune row groups, so a
  * selective scan READS less — the layout-side half of predicate
  * pushdown, and at 100 TB the difference between touching 1% and 100%
  * of a table. Evidence: the same filter over the same rows emits fewer
  * rows from the scan node (post-rowgroup-skip, pre-Spark-filter) when
  * the file is sorted.
  */
class LayoutSkippingSpec extends SparkSpec {

  test("sortWithinPartitions on the filter column prunes parquet row groups") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-layout")
    val rows = (0 until 200000).map(i => (i.toLong, i % 1000, s"payload-$i"))
      .toDF("k", "bucket", "payload")
    // small row groups so a single file has many prunable units
    val sortedOut = base.resolve("sorted").toString
    val shuffledOut = base.resolve("shuffled").toString
    rows.orderBy(col("k")).coalesce(1)
      .write.option("parquet.block.size", 64 * 1024).parquet(sortedOut)
    rows.orderBy(col("bucket"), col("k")).coalesce(1) // k-order destroyed
      .write.option("parquet.block.size", 64 * 1024).parquet(shuffledOut)

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("k").between(1000, 1999))
      assert(df.count() === 1000)
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      df.collect()
      scan.metrics("numOutputRows").value
    }

    val sorted = scannedRows(sortedOut)
    val shuffled = scannedRows(shuffledOut)
    assert(sorted < shuffled / 4,
      s"sorted layout should skip most row groups: sorted=$sorted shuffled=$shuffled")
  }

  test("zValue2 interleaves bits (a even, b odd)") {
    import spark.implicits._
    val rows = Seq((3L, 0L), (0L, 3L), (3L, 3L), (0xFFFFL, 0L), (0L, 0xFFFFL))
      .toDF("a", "b")
      .select(Layout.zValue2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(5L, 10L, 15L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("zValueN generalizes zValue2 bit-for-bit and round-robins 3 columns") {
    import spark.implicits._
    val pairs = Seq((3L, 0L), (0L, 3L), (3L, 3L), (0xFFFFL, 0L), (0L, 0xFFFFL),
      (12345L, 54321L))
    val mismatch = pairs.toDF("a", "b")
      .select(Layout.zValue2(col("a"), col("b")).as("z2"),
        Layout.zValueN(Seq(col("a"), col("b")), 16).as("zn"))
      .filter(col("z2") =!= col("zn")).count()
    assert(mismatch === 0)
    // 3 columns: bit 0 of col i sits at position i
    val z3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(Layout.zValueN(Seq(col("a"), col("b"), col("c")), 1))
      .collect().head.getLong(0)
    assert(z3 === 7L)
  }

  test("3-D Z-order prunes a 3-D box multiplicatively vs single-column sort") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-zorder3")
    // three independent pseudo-random 16-bit dimensions
    val rows = spark.range(400000)
      .select(col("id"),
        pmod(hash(lit("x"), col("id")), lit(65536)).cast("long").as("x"),
        pmod(hash(lit("y"), col("id")), lit(65536)).cast("long").as("y"),
        pmod(hash(lit("z"), col("id")), lit(65536)).cast("long").as("z"))
    val xOut = base.resolve("xsorted").toString
    val zOut = base.resolve("zorder3").toString
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    rows.orderBy(col("x")).coalesce(1).write.options(opts).parquet(xOut)
    Layout.writeZOrderedN(rows, Seq("x", "y", "z"), zOut, numFiles = 1,
      options = opts)

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("x") < 16384 && col("y") < 16384 && col("z") < 16384) // (1/4)^3 box
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      val n = df.collect().length
      assert(n > 0, "box must be non-empty for the comparison to mean anything")
      scan.metrics("numOutputRows").value
    }

    val viaX = scannedRows(xOut)
    val viaZ = scannedRows(zOut)
    assert(viaZ < viaX / 2,
      s"3-D z-order should out-prune single-column sort on a 3-D box: z=$viaZ x=$viaX")
  }

  test("Z-order layout prunes a 2-D box multiplicatively vs single-column sort") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-zorder")
    // two independent pseudo-random 16-bit dimensions
    val rows = spark.range(400000)
      .select(col("id"),
        pmod(hash(lit("x"), col("id")), lit(65536)).cast("long").as("x"),
        pmod(hash(lit("y"), col("id")), lit(65536)).cast("long").as("y"))
    val xOut = base.resolve("xsorted").toString
    val zOut = base.resolve("zorder").toString
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    rows.orderBy(col("x")).coalesce(1).write.options(opts).parquet(xOut)
    Layout.writeZOrdered(rows, "x", "y", zOut, numFiles = 1, options = opts)

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("x") < 4096 && col("y") < 4096) // 1/16 × 1/16 box
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      val n = df.collect().length
      assert(n > 0, "box must be non-empty for the comparison to mean anything")
      scan.metrics("numOutputRows").value
    }

    val viaX = scannedRows(xOut)
    val viaZ = scannedRows(zOut)
    // x-sort prunes the x slab but reads it fully for any y; the Morton
    // curve localizes both dimensions, so the box touches far fewer
    // row groups.
    assert(viaZ < viaX / 2,
      s"z-order should out-prune single-column sort on a 2-D box: z=$viaZ x=$viaX")
  }

  test("optimizeZOrder commits a Z-clustered generation with the same pruning") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-zopt")
    val rows = spark.range(400000)
      .select(col("id"),
        pmod(hash(lit("x"), col("id")), lit(65536)).cast("long").as("x"),
        pmod(hash(lit("y"), col("id")), lit(65536)).cast("long").as("y"))
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    // the pre-optimize table: committed under Generations, x-sorted only
    val table = base.resolve("t").toString
    Generations.writeAndCommit(spark, rows.orderBy(col("x")).coalesce(1),
      table, options = opts)

    def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
      val q = df.filter(col("x") < 4096 && col("y") < 4096)
      val scan = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      assert(q.collect().nonEmpty)
      scan.metrics("numOutputRows").value
    }

    val before = scannedRows(Generations.read(spark, table).get)
    val c = Layout.optimizeZOrder(spark, table, Seq("x", "y"),
      targetBytes = Long.MaxValue, options = opts).get
    assert(c.rows === 400000L)
    assert(Generations.latest(spark, table).get.version === c.version)
    // SAME multiplicative pruning as a direct writeZOrdered, read through
    // the generation pointer — the optimize is a layout change only
    val after = scannedRows(Generations.read(spark, table).get)
    assert(after < before / 2,
      s"optimized layout should out-prune the x-sort: after=$after before=$before")
    assert(Generations.read(spark, table).get.count() === 400000L)
  }

  test("clusteringStats: exact quadrant math on a full 16x16 grid") {
    import spark.implicits._
    // every (x, y) in [0,16)²; 4 value-range files over domain 16.
    // linear: 4 x-slabs → span (4, 16); zorder: z/64 = Morton quadrants
    // → span (8, 8). est_files = Σ span / domain.
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y))
      .toDF("x", "y")
    val rows = graft.sinks.Layout.clusteringStats(
      grid, col("x"), col("y"), nFiles = 4, domain = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(rows("linear") === ((4L, 4.0, 16.0, 1.0, 4.0, 1.0)))
    assert(rows("zorder") === ((4L, 8.0, 8.0, 2.0, 2.0, 1.0)))
  }

  test("clusteringStats rejects non-power-of-two domains") {
    import spark.implicits._
    // z-binning divides by domain², valid only for pow2 domains: at
    // domain=100 the Morton key of (99,99) is 16383 > 100², which would
    // assign file ids >= nFiles and skew the report
    val df = Seq((1, 2)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.sinks.Layout.clusteringStats(df, col("x"), col("y"),
        nFiles = 4, domain = 100)
    }
    assert(e.getMessage.contains("power of two"))
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JIT/classloader warmup: one cheap query through the parquet
    // reader + codegen + shuffle paths, so per-query numbers measure
    // steady-state work instead of charging ~5 s of first-use class
    // loading to whichever query sorts first.
    // same failure tolerance as the timed loop: a broken warmup query
    // must not abort the whole report
    try SparkEntry.queries("agg_distinct_custs")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // deterministic name order: stable attribution across rounds.
    // Three reps per query, report the min: steady-state throughput,
    // robust to one-off GC/IO spikes on a shared machine (min-of-2 still
    // swung individual queries 3-4× round-over-round on this host).
    // Optional comma-separated filter for local iteration (driver sets no
    // filter and measures everything).
    // blank value = unset ("".split(",") would yield Set("") and
    // silently filter out every query)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> reps.min
    }
    // Two lines: the full per-query map first, then a compact total-only
    // line LAST — the driver's bounded tail capture truncated the r2
    // single-line report from the front, losing the total; the final
    // short line always survives a tail cut. Values rounded to ms to
    // keep the map line small.
    // Locale.ROOT: %.3f under a comma-decimal default locale would emit
    // "0,123" and corrupt the JSON
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = ms(results.map(_._2).sum)
    val report =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(report)
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}""")
    // Full per-query map also goes to a file: the driver's bounded tail
    // capture truncates the stdout map from the front (r5 lost the first
    // ~84 queries), so the on-disk artifact is the complete record.
    try {
      val out = java.nio.file.Paths.get("target", "bench_full.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        report.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // Regression gate: diff this run against the committed previous-round
    // per-query map (bench_baseline.json, refreshed each round from
    // target/bench_full.json) and flag any query > 1.5x slower — the
    // machine-readable delta table lands in target/bench_delta.json and
    // a one-line count survives the driver's tail capture. Queries absent
    // from the baseline (new this round) are skipped, not flagged.
    try {
      val basePath = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "bench_baseline.json"))
      if (java.nio.file.Files.exists(basePath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(basePath),
          java.nio.charset.StandardCharsets.UTF_8)
        val pair = """"([a-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)""".r
        val prev = pair.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .filter { case (k, _) => k != "value" && k != "round" }
          .toMap
        val deltas = results.flatMap { case (name, cur) =>
          prev.get(name).filter(_ > 0).map(p => (name, p, cur, cur / p))
        }
        val regressions = deltas.filter(_._4 > 1.5).sortBy(-_._4)
        val dj = deltas.map { case (n, p, c, r) =>
          s"""{"query":"$n","prev":${ms(p)},"cur":${ms(c)},"ratio":${ms(r)}}"""
        }.mkString("[", ",", "]")
        val rj = regressions.map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
        java.nio.file.Files.write(
          java.nio.file.Paths.get("target", "bench_delta.json"),
          s"""{"baseline":"$basePath","threshold":1.5,"n_compared":${deltas.size},"regressions":$rj,"deltas":$dj}"""
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"""{"metric":"bench_regressions","value":${regressions.size},"threshold":1.5,"compared":${deltas.size}}""")
      }
    } catch { case _: Throwable => () }
    // Shuffle-skew probe: the inverted-index joins shuffle on shingle /
    // span TEXT (zipfian by construction). Measure — don't argue — what
    // hash partitioning does to those keys: rows land in partition
    // pmod(murmur3(key), parts) (exactly HashPartitioning's id
    // expression), so the per-partition row counts below are the real
    // shuffle balance, reported as max/median ("skew" = ratio; AQE's
    // skew-join threshold is 5x median by default).
    try {
      import org.apache.spark.sql.functions._
      val parts = cpus.toInt
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def skew(keyed: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
        val counts = keyed.groupBy(col("p")).count()
          .collect().map(_.getLong(1)).sorted // <= parts rows
        if (counts.isEmpty) (0L, 0L, 0.0)
        else {
          val mx = counts.last
          val med = counts(counts.length / 2)
          (mx, med, if (med == 0) 0.0 else mx.toDouble / med)
        }
      }
      val shingles = docs.select(col("lang"), col("source"),
          explode(array_distinct(
            graft.functions.TextFns.textShingles(col("text"), 3))).as("shingle"))
        .select(pmod(hash(col("lang"), col("source"), col("shingle")),
          lit(parts)).as("p"))
      val spans = docs.select(
          explode(graft.functions.TextFns.textShingles(col("text"), 5)).as("span"))
        .select(pmod(hash(col("span")), lit(parts)).as("p"))
      val (m1, d1, s1) = skew(shingles)
      val (m2, d2, s2) = skew(spans)
      val js =
        s"""{"metric":"shuffle_skew","parts":$parts,"sf":"$sfDir","probes":{""" +
          s""""dedup_ngram_jaccard_shingle":{"max_rows":$m1,"median_rows":$d1,"skew":${ms(s1)}},""" +
          s""""text_span_hotspots_span":{"max_rows":$m2,"median_rows":$d2,"skew":${ms(s2)}}}}"""
      println(js)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target", "skew_probe.json"),
        js.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}

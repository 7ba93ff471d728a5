package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded-random property tests for incremental MV maintenance: across
  * arbitrary chains of random changesets (inserts, updates —
  * key-moving included — and deletes, with exact-tie values to stress
  * the extremes), the maintained view must equal a fresh aggregate of
  * the post-change snapshot at EVERY step. This is the maintained ≡
  * recomputed law the oracle gate pins at one changeset shape
  * (`mv_cdc_incremental_revenue`, `mv_cdc_minmax`), here exercised
  * over 10 random multi-step histories including group-emptying and
  * extreme-retracting interleavings the fixed shape cannot cover.
  */
class IncrementalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260815)

  private def toDf(rows: Seq[(Int, Int, Int)]): DataFrame =
    rows.toDF("k", "grp", "v")
      .withColumn("v", col("v").cast("decimal(18,4)"))

  private def aggOf(df: DataFrame): DataFrame =
    df.groupBy("grp").agg(sum(col("v")).as("sum_v"),
      count(lit(1)).as("n"), min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))

  private type State = Map[Int, (BigDecimal, Long, BigDecimal, BigDecimal)]

  private def collect(df: DataFrame): State =
    df.select(col("grp"), col("sum_v").cast("decimal(18,4)"), col("n"),
      col("min_v").cast("decimal(18,4)"), col("max_v").cast("decimal(18,4)"))
      .as[(Int, BigDecimal, Long, BigDecimal, BigDecimal)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("maintainAggMinMax ≡ recompute across random multi-step histories") {
    for (history <- 1 to 10) {
      // snapshot model: key -> (grp, v); values from a SMALL set so
      // duplicated extremes and exact ties are common (the hard case:
      // deleting one holder of a duplicated max must keep the max)
      var snap: Map[Int, (Int, Int)] = (1 to 20).map(k =>
        k -> (rnd.nextInt(4), rnd.nextInt(5) * 10)).toMap
      var mv = aggOf(toDf(snap.toSeq.map { case (k, (g, v)) => (k, g, v) }))
      for (step <- 1 to 4) {
        val next = {
          var m = snap
          // deletes (some phantom), updates (value and/or GROUP moves),
          // inserts — each key at most once per step (diff contract)
          rnd.shuffle((1 to 30).toList).take(8).foreach { k =>
            rnd.nextInt(3) match {
              case 0 => m -= k
              case 1 if m.contains(k) =>
                m += k -> (rnd.nextInt(4), rnd.nextInt(5) * 10)
              case _ =>
                m += k -> (rnd.nextInt(4), rnd.nextInt(5) * 10)
            }
          }
          m
        }
        val before = toDf(snap.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val after = toDf(next.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val changes = Merge.diff(before, after, Seq("k"),
          includePreimages = true)
        mv = Incremental.maintainAggMinMax(mv, changes, after, Seq("grp"),
          Map("sum_v" -> "v"), "n",
          Map("min_v" -> "v"), Map("max_v" -> "v"))
        // materialize the maintained state so the next step's plan does
        // not grow (exactly what a committed view table does)
        val state = collect(mv)
        assert(state === collect(aggOf(after)),
          s"history $history step $step: maintained != recomputed")
        mv = state.toSeq.map { case (g, (s, n, mn, mx)) => (g, s, n, mn, mx) }
          .toDF("grp", "sum_v", "n", "min_v", "max_v")
        snap = next
      }
    }
  }

  test("deltaJoin: pre-join ⊎ ΔV ≡ post-join, and composed maintenance " +
      "≡ recompute, across random two-table histories") {
    // A(k, g, v) ⋈ B(g, w) on g — dimension-shaped B (unique g) so the
    // inner-join multiset is easy to model; random churn on BOTH sides
    // including key-moving updates and deletes that orphan A-rows.
    def adf(rows: Seq[(Int, Int, Int)]): DataFrame =
      rows.toDF("k", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    def bdf(rows: Seq[(Int, Int)]): DataFrame = rows.toDF("g", "w")
    def joined(a: DataFrame, b: DataFrame): DataFrame = a.join(b, "g")
    def multiset(df: DataFrame): Map[(Int, Int, BigDecimal, Int), Long] =
      df.select(col("g"), col("k"), col("v").cast("decimal(18,4)"), col("w"))
        .as[(Int, Int, BigDecimal, Int)].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (history <- 1 to 6) {
      var aSnap: Map[Int, (Int, Int)] = (1 to 20).map(k =>
        k -> (rnd.nextInt(6), rnd.nextInt(5) * 10)).toMap
      var bSnap: Map[Int, Int] = (0 to 5).map(g => g -> rnd.nextInt(100)).toMap
      for (step <- 1 to 3) {
        val aNext = {
          var m = aSnap
          rnd.shuffle((1 to 28).toList).take(7).foreach { k =>
            if (rnd.nextInt(3) == 0 && m.contains(k)) m -= k
            else m += k -> (rnd.nextInt(8), rnd.nextInt(5) * 10) // g 6,7: no match
          }
          m
        }
        val bNext = {
          var m = bSnap
          rnd.shuffle((0 to 7).toList).take(3).foreach { g =>
            if (rnd.nextInt(3) == 0 && m.contains(g)) m -= g
            else m += g -> rnd.nextInt(100)
          }
          m
        }
        val aPre = adf(aSnap.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val aPost = adf(aNext.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val bPre = bdf(bSnap.toSeq)
        val bPost = bdf(bNext.toSeq)
        val dA = Merge.diff(aPre, aPost, Seq("k"), includePreimages = true)
          .select(col("_change_type"), col("k"), col("g"), col("v"))
        val dB = Merge.diff(bPre, bPost, Seq("g"), includePreimages = true)
        val feed = Incremental.deltaJoin(aPre, dA, bPre, dB, Seq("g"))
        // law 1: joined(pre) + signed feed = joined(post), as multisets
        val pre = multiset(joined(aPre, bPre))
        val post = multiset(joined(aPost, bPost))
        val delta = feed.select(col("g"), col("k"),
            col("v").cast("decimal(18,4)"), col("w"), col("_change_type"))
          .as[(Int, Int, BigDecimal, Int, String)].collect()
          .groupBy(t => (t._1, t._2, t._3, t._4)).view
          .mapValues(_.map(t => if (t._5 == "insert") 1L else -1L).sum).toMap
        val applied = (pre.keySet ++ delta.keySet).map(r =>
          r -> (pre.getOrElse(r, 0L) + delta.getOrElse(r, 0L)))
          .filter(_._2 != 0L).toMap
        assert(applied === post,
          s"history $history step $step: delta-join law broken")
        // law 2: maintainAgg over the feed ≡ fresh aggregate of the
        // post-change join (the composed multi-table IVM path)
        def agg(df: DataFrame) = df.groupBy("g")
          .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
        val maintained = Incremental.maintainAgg(agg(joined(aPre, bPre)),
          feed, Seq("g"), Map("sum_v" -> "v"), "n")
        def st(df: DataFrame) = df.select(col("g"),
            col("sum_v").cast("decimal(18,4)"), col("n"))
          .as[(Int, BigDecimal, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(st(maintained) === st(agg(joined(aPost, bPost))),
          s"history $history step $step: composed agg-over-join diverged")
        aSnap = aNext; bSnap = bNext
      }
    }
  }

  test("maintainDistinct ≡ fresh COUNT DISTINCT across random histories") {
    // values from a SMALL set so the hard cases are common: a delete
    // removing ONE of several rows supplying a distinct value (count
    // must NOT drop) vs the LAST one (count must drop)
    for (history <- 1 to 8) {
      var snap: Map[Int, (Int, Int)] = (1 to 20).map(k =>
        k -> (rnd.nextInt(3), rnd.nextInt(4))).toMap
      def snapDf(m: Map[Int, (Int, Int)]) =
        m.toSeq.map { case (k, (g, v)) => (k, g, v) }.toDF("k", "grp", "v")
      var support = snapDf(snap).groupBy("grp", "v")
        .agg(count(lit(1)).as("_support_n"))
      for (step <- 1 to 4) {
        val next = {
          var m = snap
          rnd.shuffle((1 to 28).toList).take(7).foreach { k =>
            if (rnd.nextInt(3) == 0 && m.contains(k)) m -= k
            else m += k -> (rnd.nextInt(3), rnd.nextInt(4))
          }
          m
        }
        val changes = Merge.diff(snapDf(snap), snapDf(next), Seq("k"),
          includePreimages = true)
        support = Incremental.maintainDistinct(support, changes,
          Seq("grp"), Seq("v"))
        val got = Incremental.distinctOf(support, Seq("grp"))
          .as[(Int, Long)].collect().toMap
        val want = snapDf(next).groupBy("grp")
          .agg(countDistinct(col("v")).as("n_distinct"))
          .as[(Int, Long)].collect().toMap
        assert(got === want, s"history $history step $step diverged")
        // the support itself must hold exact per-value row counts (the
        // invariant that makes the NEXT step's retraction correct)
        val supGot = support.select(col("grp"), col("v"), col("_support_n"))
          .as[(Int, Int, Long)].collect()
          .map { case (g, v, n) => (g, v) -> n }.toMap
        val supWant = snapDf(next).groupBy("grp", "v").count()
          .as[(Int, Int, Long)].collect()
          .map { case (g, v, n) => (g, v) -> n }.toMap
        assert(supGot === supWant, s"history $history step $step support drift")
        // materialize like a committed view table
        support = supGot.toSeq.map { case ((g, v), n) => (g, v, n) }
          .toDF("grp", "v", "_support_n")
        snap = next
      }
    }
  }

  test("deltaJoin composes: three-table maintenance ≡ recompute across random histories") {
    // A(k, g, v) ⋈ B(g, r) ⋈ C(r, w): Δ(A⋈B⋈C) is deltaJoin applied
    // twice, with (A⋈B)_pre as the static side of the outer call —
    // churn on ALL THREE levels including dimension deletes that orphan
    // whole subtrees and key-moving updates at each level.
    def adf(rows: Seq[(Int, Int, Int)]): DataFrame =
      rows.toDF("k", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    def bdf(rows: Seq[(Int, Int)]): DataFrame = rows.toDF("g", "r")
    def cdf(rows: Seq[(Int, Int)]): DataFrame = rows.toDF("r", "w")
    for (history <- 1 to 5) {
      var aSnap: Map[Int, (Int, Int)] = (1 to 18).map(k =>
        k -> (rnd.nextInt(5), rnd.nextInt(5) * 10)).toMap
      var bSnap: Map[Int, Int] = (0 to 4).map(g => g -> rnd.nextInt(4)).toMap
      var cSnap: Map[Int, Int] = (0 to 3).map(r => r -> rnd.nextInt(100)).toMap
      for (step <- 1 to 3) {
        val aNext = {
          var m = aSnap
          rnd.shuffle((1 to 24).toList).take(6).foreach { k =>
            if (rnd.nextInt(3) == 0 && m.contains(k)) m -= k
            else m += k -> (rnd.nextInt(6), rnd.nextInt(5) * 10)
          }
          m
        }
        val bNext = {
          var m = bSnap
          rnd.shuffle((0 to 6).toList).take(2).foreach { g =>
            if (rnd.nextInt(3) == 0 && m.contains(g)) m -= g
            else m += g -> rnd.nextInt(4)
          }
          m
        }
        val cNext = {
          var m = cSnap
          rnd.shuffle((0 to 4).toList).take(2).foreach { r =>
            if (rnd.nextInt(3) == 0 && m.contains(r)) m -= r
            else m += r -> rnd.nextInt(100)
          }
          m
        }
        val (aPre, aPost) = (adf(aSnap.toSeq.map { case (k, (g, v)) => (k, g, v) }),
          adf(aNext.toSeq.map { case (k, (g, v)) => (k, g, v) }))
        val (bPre, bPost) = (bdf(bSnap.toSeq), bdf(bNext.toSeq))
        val (cPre, cPost) = (cdf(cSnap.toSeq), cdf(cNext.toSeq))
        val dA = Merge.diff(aPre, aPost, Seq("k"), includePreimages = true)
        val dB = Merge.diff(bPre, bPost, Seq("g"), includePreimages = true)
        val dC = Merge.diff(cPre, cPost, Seq("r"), includePreimages = true)
        val feedAB = Incremental.deltaJoin(aPre, dA, bPre, dB, Seq("g"))
        val feedABC = Incremental.deltaJoin(aPre.join(bPre, "g"), feedAB,
          cPre, dC, Seq("r"))
        def agg(a: DataFrame, b: DataFrame, c: DataFrame) =
          a.join(b, "g").join(c, "r").groupBy("w")
            .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
        val maintained = Incremental.maintainAgg(agg(aPre, bPre, cPre),
          feedABC, Seq("w"), Map("sum_v" -> "v"), "n")
        def st(df: DataFrame) = df.select(col("w"),
            col("sum_v").cast("decimal(18,4)"), col("n"))
          .as[(Int, BigDecimal, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(st(maintained) === st(agg(aPost, bPost, cPost)),
          s"history $history step $step: three-way composition diverged")
        aSnap = aNext; bSnap = bNext; cSnap = cNext
      }
    }
  }

  test("deltaJoinLeft: left-join multiset law and composed maintenance across random histories") {
    // A(k, g, v) ⟕ B(g, w): null-extension rows (A-rows at B-empty g)
    // must appear/disappear exactly when a key's B-match count crosses
    // zero. B keys from a SMALL range with churn so crossings in BOTH
    // directions are common, including simultaneous two-sided churn.
    def adf(rows: Seq[(Int, Int, Int)]): DataFrame =
      rows.toDF("k", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    def bdf(rows: Seq[(Int, Int)]): DataFrame = rows.toDF("g", "w")
    def leftJoined(a: DataFrame, b: DataFrame): DataFrame = a.join(b, Seq("g"), "left")
    def multiset(df: DataFrame): Map[(Int, Int, BigDecimal, Option[Int]), Long] =
      df.select(col("g"), col("k"), col("v").cast("decimal(18,4)"), col("w"))
        .as[(Int, Int, BigDecimal, Option[Int])].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (history <- 1 to 6) {
      var aSnap: Map[Int, (Int, Int)] = (1 to 16).map(k =>
        k -> (rnd.nextInt(6), rnd.nextInt(5) * 10)).toMap
      // sparse B: many g have no match, so the view starts with nulls
      var bSnap: Map[Int, Int] = rnd.shuffle((0 to 5).toList).take(3)
        .map(g => g -> rnd.nextInt(100)).toMap
      for (step <- 1 to 3) {
        val aNext = {
          var m = aSnap
          rnd.shuffle((1 to 22).toList).take(6).foreach { k =>
            if (rnd.nextInt(3) == 0 && m.contains(k)) m -= k
            else m += k -> (rnd.nextInt(6), rnd.nextInt(5) * 10)
          }
          m
        }
        val bNext = {
          var m = bSnap
          rnd.shuffle((0 to 5).toList).take(3).foreach { g =>
            if (rnd.nextInt(2) == 0 && m.contains(g)) m -= g
            else m += g -> rnd.nextInt(100)
          }
          m
        }
        val aPre = adf(aSnap.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val aPost = adf(aNext.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val bPre = bdf(bSnap.toSeq)
        val bPost = bdf(bNext.toSeq)
        val dA = Merge.diff(aPre, aPost, Seq("k"), includePreimages = true)
          .select(col("_change_type"), col("k"), col("g"), col("v"))
        val dB = Merge.diff(bPre, bPost, Seq("g"), includePreimages = true)
        val feed = Incremental.deltaJoinLeft(aPre, dA, bPre, dB, Seq("g"))
        // law 1: leftJoined(pre) + signed feed = leftJoined(post)
        val pre = multiset(leftJoined(aPre, bPre))
        val post = multiset(leftJoined(aPost, bPost))
        val delta = feed.select(col("g"), col("k"),
            col("v").cast("decimal(18,4)"), col("w"), col("_change_type"))
          .as[(Int, Int, BigDecimal, Option[Int], String)].collect()
          .groupBy(t => (t._1, t._2, t._3, t._4)).view
          .mapValues(_.map(t => if (t._5 == "insert") 1L else -1L).sum).toMap
        val applied = (pre.keySet ++ delta.keySet).map(r =>
          r -> (pre.getOrElse(r, 0L) + delta.getOrElse(r, 0L)))
          .filter(_._2 != 0L).toMap
        assert(applied === post,
          s"history $history step $step: left delta-join law broken")
        // law 2: maintained agg over the LEFT feed ≡ fresh aggregate —
        // count(*) counts null-extended rows, sum skips their null w.
        // COALESCE the stored sum on both sides: SQL sum over an
        // all-null group is NULL, maintainAgg's retraction arithmetic
        // carries 0 — the documented convention for nullable payloads
        def agg(df: DataFrame) = df.groupBy("g")
          .agg(coalesce(sum(col("w")), lit(0L)).as("sum_w"),
            count(lit(1)).as("n"))
        val maintained = Incremental.maintainAgg(agg(leftJoined(aPre, bPre)),
          feed, Seq("g"), Map("sum_w" -> "w"), "n")
        def st(df: DataFrame) = df.select(col("g"), col("sum_w"), col("n"))
          .as[(Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(st(maintained) === st(agg(leftJoined(aPost, bPost))),
          s"history $history step $step: composed left-join agg diverged")
        aSnap = aNext; bSnap = bNext
      }
    }
  }

  test("deltaSemiJoin / deltaAntiJoin / deltaJoinFull: membership laws across random histories") {
    // shared random two-table histories; at each step assert ALL the
    // join-type feeds against their fresh recomputes as multisets, plus
    // the partition identity semi ⊎ anti ≡ ΔA
    def adf(rows: Seq[(Int, Int, Int)]): DataFrame =
      rows.toDF("k", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    def bdf(rows: Seq[(Int, Int)]): DataFrame = rows.toDF("g", "w")
    def msA(df: DataFrame): Map[(Int, Int, BigDecimal), Long] =
      df.select(col("k"), col("g"), col("v").cast("decimal(18,4)"))
        .as[(Int, Int, BigDecimal)].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def msFull(df: DataFrame): Map[(Int, Option[Int], Option[BigDecimal], Option[Int]), Long] =
      df.select(col("g"), col("k"), col("v").cast("decimal(18,4)"), col("w"))
        .as[(Int, Option[Int], Option[BigDecimal], Option[Int])].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def signedA(feed: DataFrame): Map[(Int, Int, BigDecimal), Long] =
      feed.select(col("k"), col("g"), col("v").cast("decimal(18,4)"),
          col("_change_type"))
        .as[(Int, Int, BigDecimal, String)].collect()
        .groupBy(t => (t._1, t._2, t._3)).view
        .mapValues(_.map(t => if (t._4 == "insert") 1L else -1L).sum)
        .filter(_._2 != 0L).toMap
    def signedFull(feed: DataFrame): Map[(Int, Option[Int], Option[BigDecimal], Option[Int]), Long] =
      feed.select(col("g"), col("k"), col("v").cast("decimal(18,4)"),
          col("w"), col("_change_type"))
        .as[(Int, Option[Int], Option[BigDecimal], Option[Int], String)].collect()
        .groupBy(t => (t._1, t._2, t._3, t._4)).view
        .mapValues(_.map(t => if (t._5 == "insert") 1L else -1L).sum).toMap
    def applied[K](pre: Map[K, Long], delta: Map[K, Long]): Map[K, Long] =
      (pre.keySet ++ delta.keySet).map(r =>
        r -> (pre.getOrElse(r, 0L) + delta.getOrElse(r, 0L)))
        .filter(_._2 != 0L).toMap
    for (history <- 1 to 5) {
      var aSnap: Map[Int, (Int, Int)] = (1 to 16).map(k =>
        k -> (rnd.nextInt(6), rnd.nextInt(5) * 10)).toMap
      var bSnap: Map[Int, Int] = rnd.shuffle((0 to 5).toList).take(3)
        .map(g => g -> rnd.nextInt(100)).toMap
      for (step <- 1 to 3) {
        val aNext = {
          var m = aSnap
          rnd.shuffle((1 to 22).toList).take(6).foreach { k =>
            if (rnd.nextInt(3) == 0 && m.contains(k)) m -= k
            else m += k -> (rnd.nextInt(6), rnd.nextInt(5) * 10)
          }
          m
        }
        val bNext = {
          var m = bSnap
          rnd.shuffle((0 to 5).toList).take(3).foreach { g =>
            if (rnd.nextInt(2) == 0 && m.contains(g)) m -= g
            else m += g -> rnd.nextInt(100)
          }
          m
        }
        val aPre = adf(aSnap.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val aPost = adf(aNext.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val bPre = bdf(bSnap.toSeq)
        val bPost = bdf(bNext.toSeq)
        val dA = Merge.diff(aPre, aPost, Seq("k"), includePreimages = true)
          .select(col("_change_type"), col("k"), col("g"), col("v"))
        val dB = Merge.diff(bPre, bPost, Seq("g"), includePreimages = true)
        // semi law
        val semi = Incremental.deltaSemiJoin(aPre, dA, bPre, dB, Seq("g"))
        assert(applied(msA(aPre.join(bPre, Seq("g"), "left_semi")), signedA(semi))
          === msA(aPost.join(bPost, Seq("g"), "left_semi")),
          s"history $history step $step: semi-join law broken")
        // anti law
        val anti = Incremental.deltaAntiJoin(aPre, dA, bPre, dB, Seq("g"))
        assert(applied(msA(aPre.join(bPre, Seq("g"), "left_anti")), signedA(anti))
          === msA(aPost.join(bPost, Seq("g"), "left_anti")),
          s"history $history step $step: anti-join law broken")
        // partition identity: semi ⊎ anti ≡ ΔA (as signed multisets)
        val dAsigned = signedA(dA.withColumn("_change_type",
          when(col("_change_type").isin("insert", "update_postimage"),
            "insert").otherwise("delete")))
        val both = (signedA(semi).keySet ++ signedA(anti).keySet).map(r =>
          r -> (signedA(semi).getOrElse(r, 0L) + signedA(anti).getOrElse(r, 0L)))
          .filter(_._2 != 0L).toMap
        assert(both === dAsigned,
          s"history $history step $step: semi ⊎ anti != ΔA")
        // full-outer law
        val full = Incremental.deltaJoinFull(aPre, dA, bPre, dB, Seq("g"))
        assert(applied(msFull(aPre.join(bPre, Seq("g"), "full_outer")),
            signedFull(full))
          === msFull(aPost.join(bPost, Seq("g"), "full_outer")),
          s"history $history step $step: full-outer law broken")
        aSnap = aNext; bSnap = bNext
      }
    }
  }

  test("delta-join family: membership laws hold across random NULL-keyed histories") {
    // the randomized form of the deterministic null-key test above:
    // ~20% of A rows carry a NULL join key (and B may carry a null-g
    // row of its own), churned freely across steps — every feed must
    // still match Spark's own join recomputes as multisets.
    def adf(rows: Seq[(Int, Option[Int], Int)]): DataFrame =
      rows.toDF("k", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    def bdf(rows: Seq[(Option[Int], Int)]): DataFrame = rows.toDF("g", "w")
    def msA(df: DataFrame): Map[(Int, Option[Int], BigDecimal), Long] =
      df.select(col("k"), col("g"), col("v").cast("decimal(18,4)"))
        .as[(Int, Option[Int], BigDecimal)].collect()
        .groupBy(r => r).view.mapValues(_.length.toLong).toMap
    def msFull(df: DataFrame)
        : Map[(Option[Int], Option[Int], Option[BigDecimal], Option[Int]), Long] =
      df.select(col("g"), col("k"), col("v").cast("decimal(18,4)"), col("w"))
        .as[(Option[Int], Option[Int], Option[BigDecimal], Option[Int])]
        .collect().groupBy(r => r).view.mapValues(_.length.toLong).toMap
    def signedA(feed: DataFrame): Map[(Int, Option[Int], BigDecimal), Long] =
      feed.select(col("k"), col("g"), col("v").cast("decimal(18,4)"),
          col("_change_type"))
        .as[(Int, Option[Int], BigDecimal, String)].collect()
        .groupBy(t => (t._1, t._2, t._3)).view
        .mapValues(_.map(t => if (t._4 == "insert") 1L else -1L).sum)
        .filter(_._2 != 0L).toMap
    def signedFull(feed: DataFrame)
        : Map[(Option[Int], Option[Int], Option[BigDecimal], Option[Int]), Long] =
      feed.select(col("g"), col("k"), col("v").cast("decimal(18,4)"),
          col("w"), col("_change_type"))
        .as[(Option[Int], Option[Int], Option[BigDecimal], Option[Int], String)]
        .collect().groupBy(t => (t._1, t._2, t._3, t._4)).view
        .mapValues(_.map(t => if (t._5 == "insert") 1L else -1L).sum).toMap
    def applied[K](pre: Map[K, Long], delta: Map[K, Long]): Map[K, Long] =
      (pre.keySet ++ delta.keySet).map(r =>
        r -> (pre.getOrElse(r, 0L) + delta.getOrElse(r, 0L)))
        .filter(_._2 != 0L).toMap
    def randG(): Option[Int] =
      if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(5))
    for (history <- 1 to 4) {
      var aSnap: Map[Int, (Option[Int], Int)] = (1 to 14).map(k =>
        k -> (randG(), rnd.nextInt(5) * 10)).toMap
      var bSnap: Map[Option[Int], Int] =
        (rnd.shuffle((0 to 4).toList).take(2).map(g => Option(g) -> rnd.nextInt(100))
          :+ (Option.empty[Int] -> rnd.nextInt(100))).toMap
      for (step <- 1 to 3) {
        val aNext = {
          var m = aSnap
          rnd.shuffle((1 to 18).toList).take(6).foreach { k =>
            if (rnd.nextInt(3) == 0 && m.contains(k)) m -= k
            else m += k -> (randG(), rnd.nextInt(5) * 10)
          }
          m
        }
        val bNext = {
          var m = bSnap
          (rnd.shuffle((0 to 4).toList).take(2).map(Option(_))
            :+ Option.empty[Int]).foreach { g =>
            if (rnd.nextInt(2) == 0 && m.contains(g)) m -= g
            else m += g -> rnd.nextInt(100)
          }
          m
        }
        val aPre = adf(aSnap.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val aPost = adf(aNext.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val bPre = bdf(bSnap.toSeq)
        val bPost = bdf(bNext.toSeq)
        // A-side feed via diff (keyed on non-null k; g is payload and
        // may be null); B-side feed HAND-BUILT (diff's key contract is
        // non-null) as delete(old)+insert(new) per changed g
        val dA = Merge.diff(aPre, aPost, Seq("k"), includePreimages = true)
          .select(col("_change_type"), col("k"), col("g"), col("v"))
        val dBrows =
          (bSnap.keySet ++ bNext.keySet).toSeq.flatMap { g =>
            (bSnap.get(g), bNext.get(g)) match {
              case (Some(o), Some(n)) if o == n => Nil
              case (o, n) =>
                o.map(w => ("delete", g, w)).toSeq ++
                  n.map(w => ("insert", g, w)).toSeq
            }
          }
        val dB = dBrows.toDF("_change_type", "g", "w")
        val leftF = Incremental.deltaJoinLeft(aPre, dA, bPre, dB, Seq("g"))
        assert(applied(msFull(aPre.join(bPre, Seq("g"), "left")),
            signedFull(leftF))
          === msFull(aPost.join(bPost, Seq("g"), "left")),
          s"history $history step $step: left law broken under null keys")
        val full = Incremental.deltaJoinFull(aPre, dA, bPre, dB, Seq("g"))
        assert(applied(msFull(aPre.join(bPre, Seq("g"), "full_outer")),
            signedFull(full))
          === msFull(aPost.join(bPost, Seq("g"), "full_outer")),
          s"history $history step $step: full law broken under null keys")
        val semi = Incremental.deltaSemiJoin(aPre, dA, bPre, dB, Seq("g"))
        assert(applied(msA(aPre.join(bPre, Seq("g"), "left_semi")),
            signedA(semi))
          === msA(aPost.join(bPost, Seq("g"), "left_semi")),
          s"history $history step $step: semi law broken under null keys")
        val anti = Incremental.deltaAntiJoin(aPre, dA, bPre, dB, Seq("g"))
        assert(applied(msA(aPre.join(bPre, Seq("g"), "left_anti")),
            signedA(anti))
          === msA(aPost.join(bPost, Seq("g"), "left_anti")),
          s"history $history step $step: anti law broken under null keys")
        aSnap = aNext; bSnap = bNext
      }
    }
  }

  test("applyFeed: materialized rowset maintenance ≡ recompute, duplicates and nulls exact") {
    // duplicate-instance cancellation: a multiset view with repeated
    // rows must lose exactly ONE instance per delete
    val view = Seq((1, 10), (1, 10), (1, 10), (2, 20)).toDF("k", "v")
    val feed = Seq(("delete", 1, 10), ("insert", 3, 30), ("delete", 2, 20))
      .toDF("_change_type", "k", "v")
    val got = Incremental.applyFeed(view, feed)
      .as[(Int, Int)].collect().toSeq.sorted
    assert(got === Seq((1, 10), (1, 10), (3, 30)),
      "one instance cancelled, one group emptied, one inserted")

    // null-safe cancellation: null-extended rows (outer-join shape)
    // must cancel by full-row equality — a join could never match them
    val nview = Seq((1, Some(10)), (2, None), (3, None)).toDF("k", "v")
    val nfeed = Seq(("delete", 2, None: Option[Int]), ("insert", 2, Some(7)))
      .toDF("_change_type", "k", "v")
    val ngot = Incremental.applyFeed(nview, nfeed)
      .as[(Int, Option[Int])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(ngot === Seq((1, Some(10)), (2, Some(7)), (3, None)),
      "null row cancelled, non-null sibling inserted, other null kept")

    // and across random left-join histories: applyFeed(pre-join rowset,
    // deltaJoinLeft feed) ≡ the fresh post-change left join
    def adf(rows: Seq[(Int, Int, Int)]): DataFrame =
      rows.toDF("k", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    def bdf(rows: Seq[(Int, Int)]): DataFrame = rows.toDF("g", "w")
    def ms(df: DataFrame): Map[(Int, Int, BigDecimal, Option[Int]), Long] =
      df.select(col("g"), col("k"), col("v").cast("decimal(18,4)"), col("w"))
        .as[(Int, Int, BigDecimal, Option[Int])].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (history <- 1 to 3) {
      var aSnap: Map[Int, (Int, Int)] = (1 to 14).map(k =>
        k -> (rnd.nextInt(5), rnd.nextInt(4) * 10)).toMap
      var bSnap: Map[Int, Int] = rnd.shuffle((0 to 4).toList).take(3)
        .map(g => g -> rnd.nextInt(50)).toMap
      for (step <- 1 to 2) {
        val aNext = {
          var m = aSnap
          rnd.shuffle((1 to 18).toList).take(5).foreach { k =>
            if (rnd.nextInt(3) == 0 && m.contains(k)) m -= k
            else m += k -> (rnd.nextInt(5), rnd.nextInt(4) * 10)
          }
          m
        }
        val bNext = {
          var m = bSnap
          rnd.shuffle((0 to 4).toList).take(2).foreach { g =>
            if (rnd.nextInt(2) == 0 && m.contains(g)) m -= g
            else m += g -> rnd.nextInt(50)
          }
          m
        }
        val aPre = adf(aSnap.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val aPost = adf(aNext.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val bPre = bdf(bSnap.toSeq); val bPost = bdf(bNext.toSeq)
        val dA = Merge.diff(aPre, aPost, Seq("k"), includePreimages = true)
          .select(col("_change_type"), col("k"), col("g"), col("v"))
        val dB = Merge.diff(bPre, bPost, Seq("g"), includePreimages = true)
        val pre = aPre.join(bPre, Seq("g"), "left")
        val maintained = Incremental.applyFeed(pre,
          Incremental.deltaJoinLeft(aPre, dA, bPre, dB, Seq("g")))
        assert(ms(maintained) === ms(aPost.join(bPost, Seq("g"), "left")),
          s"history $history step $step: materialized left join diverged")
        aSnap = aNext; bSnap = bNext
      }
    }
  }

  test("maintainTopK ≡ fresh top-k across random histories, ties and small groups included") {
    // values from a SMALL set so exact ties are common (the tiebreak
    // column must make ranking deterministic) and groups often hold
    // fewer than k rows
    val k = 3
    def topkOf(df: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy(col("v").desc, col("k").asc)
      df.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= k).drop("_r")
    }
    def rows(df: DataFrame): Set[(Int, Int, Int)] =
      df.select(col("grp"), col("k"), col("v"))
        .as[(Int, Int, Int)].collect().toSet
    for (history <- 1 to 6) {
      var snap: Map[Int, (Int, Int)] = (1 to 18).map(kk =>
        kk -> (rnd.nextInt(4), rnd.nextInt(6) * 10)).toMap
      def df(m: Map[Int, (Int, Int)]) =
        m.toSeq.map { case (kk, (g, v)) => (kk, g, v) }.toDF("k", "grp", "v")
      var view = topkOf(df(snap))
      for (step <- 1 to 4) {
        val next = {
          var m = snap
          rnd.shuffle((1 to 26).toList).take(7).foreach { kk =>
            if (rnd.nextInt(3) == 0 && m.contains(kk)) m -= kk
            else m += kk -> (rnd.nextInt(4), rnd.nextInt(6) * 10)
          }
          m
        }
        val changes = Merge.diff(df(snap), df(next), Seq("k"),
          includePreimages = true)
        view = Incremental.maintainTopK(view, changes, df(next),
          Seq("grp"), "v", "k", k)
        val got = rows(view)
        assert(got === rows(topkOf(df(next))),
          s"history $history step $step: maintained top-k diverged")
        // materialize like a committed view table
        view = got.toSeq.map { case (g, kk, v) => (kk, g, v) }
          .toDF("k", "grp", "v")
        snap = next
      }
    }
  }

  test("maintainAgg (sum/count) ≡ recompute across random histories") {
    for (history <- 1 to 6) {
      var snap: Map[Int, (Int, Int)] = (1 to 15).map(k =>
        k -> (rnd.nextInt(3), rnd.nextInt(100))).toMap
      def agg(df: DataFrame) = df.groupBy("grp")
        .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
      var mv = agg(toDf(snap.toSeq.map { case (k, (g, v)) => (k, g, v) }))
      for (step <- 1 to 3) {
        val next = {
          var m = snap
          rnd.shuffle((1 to 25).toList).take(6).foreach { k =>
            if (rnd.nextBoolean() && m.contains(k)) m -= k
            else m += k -> (rnd.nextInt(3), rnd.nextInt(100))
          }
          m
        }
        val before = toDf(snap.toSeq.map { case (k, (g, v)) => (k, g, v) })
        val after = toDf(next.toSeq.map { case (k, (g, v)) => (k, g, v) })
        mv = Incremental.maintainAgg(mv,
          Merge.diff(before, after, Seq("k"), includePreimages = true),
          Seq("grp"), Map("sum_v" -> "v"), "n")
        val got = mv.select(col("grp"), col("sum_v").cast("decimal(18,4)"),
          col("n")).as[(Int, BigDecimal, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        val want = agg(after).select(col("grp"),
          col("sum_v").cast("decimal(18,4)"), col("n"))
          .as[(Int, BigDecimal, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got === want, s"history $history step $step diverged")
        mv = got.toSeq.map { case (g, (s, n)) => (g, s, n) }
          .toDF("grp", "sum_v", "n")
        snap = next
      }
    }
  }

  test("delta-join family: NULL-keyed rows churn exactly like a real outer join") {
    // SQL equi-join semantics: a NULL key matches NOTHING, so a
    // null-keyed A-row is a PERMANENT null-extension/anti member and
    // never a semi/inner member. The r13-ADVICE defect: the feeds'
    // equi-join machinery silently dropped null-keyed churn, so a
    // maintained LEFT/FULL/ANTI view lost rows a recompute retains.
    def adf(rows: Seq[(Int, Option[Int], Int)]): DataFrame =
      rows.toDF("k", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    def bdf(rows: Seq[(Option[Int], Int)]): DataFrame = rows.toDF("g", "w")
    def ms(df: DataFrame)
        : Map[(Option[Int], Option[Int], Option[BigDecimal], Option[Int]), Long] =
      df.select(col("g"), col("k"), col("v").cast("decimal(18,4)"), col("w"))
        .as[(Option[Int], Option[Int], Option[BigDecimal], Option[Int])]
        .collect()
        .groupBy(r => r).view.mapValues(_.length.toLong).toMap
    def msA(df: DataFrame): Map[(Option[Int], Int, BigDecimal), Long] =
      df.select(col("g"), col("k"), col("v").cast("decimal(18,4)"))
        .as[(Option[Int], Int, BigDecimal)].collect()
        .groupBy(r => r).view.mapValues(_.length.toLong).toMap
    def applyTo[R](pre: Map[R, Long], feed: Map[R, Long]): Map[R, Long] =
      (pre.keySet ++ feed.keySet).map(r =>
        r -> (pre.getOrElse(r, 0L) + feed.getOrElse(r, 0L)))
        .filter(_._2 != 0L).toMap
    def signed[R](rows: Seq[(R, String)]): Map[R, Long] =
      rows.groupBy(_._1).view
        .mapValues(_.map(t => if (t._2 == "insert") 1L else -1L).sum)
        .filter(_._2 != 0L).toMap

    // pre: one null-keyed A row (k=1); post: k=1 deleted, k=2 null-keyed
    // inserted, k=3 moves FROM a matched key TO null, k=4 moves from
    // null to a matched key; B churns a null-keyed row of its own
    // (which must only affect the FULL join's B-side extension)
    val aPre = adf(Seq((1, None, 10), (3, Some(7), 30), (4, None, 40),
      (5, Some(7), 50)))
    val aPost = adf(Seq((2, None, 20), (3, None, 30), (4, Some(7), 40),
      (5, Some(7), 50)))
    val bPre = bdf(Seq((Some(7), 700), (None, 999)))
    val bPost = bdf(Seq((Some(7), 700), (None, 998)))
    val dA = Merge.diff(aPre, aPost, Seq("k"), includePreimages = true)
      .select(col("_change_type"), col("k"), col("g"), col("v"))
    // B's feed hand-built: Merge.diff's DIFF keys are non-null by
    // contract (presence flags), but null JOIN keys legitimately arrive
    // through insert/delete-tagged feeds (e.g. the fact-log path tags
    // whole deltas "insert") — exactly what this test rides in on
    val dB = Seq(("delete", Option.empty[Int], 999),
      ("insert", Option.empty[Int], 998))
      .toDF("_change_type", "g", "w")

    // LEFT: null-keyed A rows ride null-extended
    val leftFeed = Incremental.deltaJoinLeft(aPre, dA, bPre, dB, Seq("g"))
    val leftApplied = applyTo(ms(aPre.join(bPre, Seq("g"), "left")),
      signed(leftFeed.select(col("g"), col("k"),
          col("v").cast("decimal(18,4)"), col("w"), col("_change_type"))
        .as[(Option[Int], Option[Int], Option[BigDecimal], Option[Int], String)]
        .collect().toSeq.map(t => ((t._1, t._2, t._3, t._4), t._5))))
    assert(leftApplied === ms(aPost.join(bPost, Seq("g"), "left")),
      "left feed lost null-keyed churn")

    // FULL: both sides' null-keyed rows ride
    val fullFeed = Incremental.deltaJoinFull(aPre, dA, bPre, dB, Seq("g"))
    val fullApplied = applyTo(ms(aPre.join(bPre, Seq("g"), "full")),
      signed(fullFeed.select(col("g"), col("k"),
          col("v").cast("decimal(18,4)"), col("w"), col("_change_type"))
        .as[(Option[Int], Option[Int], Option[BigDecimal], Option[Int], String)]
        .collect().toSeq.map(t => ((t._1, t._2, t._3, t._4), t._5))))
    assert(fullApplied === ms(aPost.join(bPost, Seq("g"), "full")),
      "full feed lost null-keyed churn")

    // ANTI: null-keyed A rows are permanent members
    val antiFeed = Incremental.deltaAntiJoin(aPre, dA, bPre, dB, Seq("g"))
    val antiApplied = applyTo(msA(aPre.join(bPre, Seq("g"), "left_anti")),
      signed(antiFeed.select(col("g"), col("k"),
          col("v").cast("decimal(18,4)"), col("_change_type"))
        .as[(Option[Int], Int, BigDecimal, String)]
        .collect().toSeq.map(t => ((t._1, t._2, t._3), t._4))))
    assert(antiApplied === msA(aPost.join(bPost, Seq("g"), "left_anti")),
      "anti feed lost null-keyed churn")

    // SEMI: null-keyed A rows are never members — feed must NOT emit them
    val semiFeed = Incremental.deltaSemiJoin(aPre, dA, bPre, dB, Seq("g"))
    val semiApplied = applyTo(msA(aPre.join(bPre, Seq("g"), "left_semi")),
      signed(semiFeed.select(col("g"), col("k"),
          col("v").cast("decimal(18,4)"), col("_change_type"))
        .as[(Option[Int], Int, BigDecimal, String)]
        .collect().toSeq.map(t => ((t._1, t._2, t._3), t._4))))
    assert(semiApplied === msA(aPost.join(bPost, Seq("g"), "left_semi")),
      "semi feed must exclude null-keyed rows")
  }
}

package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.{DotProductExpr, LshBandsExpr, MinhashSigExpr, ShinglesExpr}

/** Parity of the native hot-path expressions (ShinglesExpr, MinhashSigExpr,
  * LshBandsExpr, DotProductExpr) with the declarative built-in chains they
  * replaced — same values on seeded-random inputs, plus the edge cases the
  * declarative forms got wrong or left nondeterministic.
  */
class TextVectorNativeSpec extends SparkSpec {

  private val rnd = new Random(20260812)
  private def randText(): String = {
    val words = Seq("alpha", "beta", "Gamma42", "δélta", "e", "", "ZIP-9",
      "the", "quick", "brown", "über", "123", "x_y", "..", "tok")
    (0 until rnd.nextInt(60)).map(_ => words(rnd.nextInt(words.size)))
      .mkString(Seq(" ", ", ", "\n", "  ")(rnd.nextInt(4)))
  }

  test("ShinglesExpr == wordShingles(tokens(text), n) on random text") {
    import spark.implicits._
    // declarative tokens built inline — TextFns.tokens is itself
    // native-backed now, so the reference must not go through it
    val declTokens = filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
    val texts = (0 until 200).map(_ => randText()) :+ "" :+ "one two" :+ "!!!"
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = texts.toDF("text")
        .select(
          ShinglesExpr.shinglesNative(col("text"), n).as("native"),
          TextFns.wordShingles(declTokens, n).as("declarative"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("MinhashSigExpr == per-seed array_min(transform(md5)) formula") {
    import spark.implicits._
    val k = 8
    val texts = (0 until 100).map(_ => randText()) :+ "a b c d e" :+ "xy"
    val naive = array((0 until k).map(i => TextFns.minhash(col("shingles"), i)): _*)
    val rows = texts.toDF("text")
      .select(ShinglesExpr.shinglesNative(col("text"), 3).as("shingles"))
      .select(
        MinhashSigExpr.minhashSigNative(col("shingles"), k).as("native"),
        naive.as("declarative"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("LshBandsExpr == md5(concat_ws('|', element_at(sig, ...))) per band") {
    import spark.implicits._
    val texts = (0 until 100).map(_ => randText()).filter(_.trim.nonEmpty)
    for ((k, bands) <- Seq((16, 4), (8, 2), (12, 3), (4, 4))) {
      val r0 = k / bands
      val declared = array((0 until bands).map(b =>
        md5(concat_ws("|", (0 until r0).map(i =>
          element_at(col("sig"), b * r0 + i + 1)): _*))): _*)
      val rows = texts.toDF("text")
        .select(ShinglesExpr.shinglesNative(col("text"), 3).as("shingles"))
        .filter(size(col("shingles")) > 0)
        .select(
          LshBandsExpr.lshBandsNative(col("shingles"), k, bands).as("native"),
          MinhashSigExpr.minhashSigNative(col("shingles"), k).as("sig"))
        .select(col("native"), declared.as("declarative"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"k=$k bands=$bands")
      }
    }
  }

  test("ShinglesExpr lowercases like the lower() builtin on non-ASCII text") {
    import spark.implicits._
    val declTokens = filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
    val rows = Seq("ÜBER Straße ÇA VA", "ЯЗЫК Test MIXED δΕλΤα", "İstanbul Iİ")
      .toDF("text")
      .select(
        ShinglesExpr.shinglesNative(col("text"), 1).as("native"),
        TextFns.wordShingles(declTokens, 1).as("declarative"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("LshBandsExpr: empty shingle set yields an EMPTY band array (no shared bucket)") {
    import spark.implicits._
    val rows = Seq("", "!!", "a b").toDF("text")
      .select(LshBandsExpr.lshBandsNative(
        ShinglesExpr.shinglesNative(col("text"), 3), 16, 4).as("bands"))
      .collect()
    assert(rows.forall(_.getSeq[String](0).isEmpty))
    // so token-poor docs generate no banded rows and can never pair
  }

  test("SimhashExpr == declarative md5-nibble-vote formula; null on no tokens") {
    import spark.implicits._
    import graft.functions.expressions.SimhashExpr
    val texts = (0 until 150).map(_ => randText()).filter(_.trim.nonEmpty)
    // declarative reference: fold token md5s into 16 nibble votes
    val hashes = transform(TextFns.tokens(col("text")), t => md5(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 16),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(1), lit(16)),
          p => when(h.substr(p, lit(1)).rlike("[89a-f]"), 1).otherwise(-1)),
        (a, b) => a + b))
    val declared = concat((1 to 16).map(p =>
      when(element_at(votes, p) >= 0, lit("1")).otherwise(lit("0"))): _*)
    val rows = texts.toDF("text")
      .filter(size(TextFns.tokens(col("text"))) > 0)
      .select(
        SimhashExpr.simhashNative(ShinglesExpr.shinglesNative(col("text"), 1)).as("native"),
        declared.as("declarative"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))

    val empties = Seq("", "  ", "!!!").toDF("text")
      .select(SimhashExpr.simhashNative(ShinglesExpr.shinglesNative(col("text"), 1)))
      .collect()
    assert(empties.forall(_.isNullAt(0)))
  }

  test("DotProductExpr == HOF fold; null on length mismatch / null element") {
    import spark.implicits._
    val vecs = (0 until 50).map { _ =>
      val d = 1 + rnd.nextInt(8)
      (Seq.fill(d)(rnd.nextDouble() * 2 - 1), Seq.fill(d)(rnd.nextDouble() * 2 - 1))
    }
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = vecs.toDF("a", "b")
      .select(
        DotProductExpr.dotNative(col("a"), col("b")).as("native"),
        hof(col("a"), col("b")).as("declarative"))
      .collect()
    rows.foreach { r =>
      // exact: same summation order, same doubles
      assert(r.getDouble(0) === r.getDouble(1))
    }
    val edge = Seq(
      (Seq(1.0, 2.0), Seq(1.0)),           // length mismatch
      (Seq.empty[Double], Seq.empty[Double])) // empty == 0.0
      .toDF("a", "b")
      .select(DotProductExpr.dotNative(col("a"), col("b")))
      .collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getDouble(0) === 0.0)
  }

  test("WinnowExpr == declarative sliding-window-minima formula") {
    import spark.implicits._
    import graft.functions.expressions.WinnowExpr
    val w = 4
    val texts = (0 until 150).map(_ => randText())
    val h = transform(ShinglesExpr.shinglesNative(col("text"), 3), sh => md5(sh))
    val declaredWins = transform(sequence(lit(1), size(col("h"))),
      i => array_min(slice(col("h"), i, lit(w))))
    val rows = texts.toDF("text")
      .select(col("text"), h.as("h"))
      .filter(size(col("h")) > 0) // declarative sequence(1, 0) errors on empty
      .select(
        WinnowExpr.winnowNative(ShinglesExpr.shinglesNative(col("text"), 3), w).as("native"),
        array_distinct(declaredWins).as("declarative"))
      .collect()
    rows.foreach { r =>
      // distinct sets equal; native preserves first-seen order, compare sorted
      assert(r.getSeq[String](0).sorted === r.getSeq[String](1).sorted)
      assert(r.getSeq[String](0).size === r.getSeq[String](1).size)
    }
  }

  test("SQL registration: word_shingles/minhash_sig/lsh_bands/simhash16/dot_product/token_stats callable") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  minhash_sig(word_shingles('a b c d', 2), 4) AS sig,
        |  size(lsh_bands(word_shingles('a b c d', 2), 4, 2)) AS n_bands,
        |  simhash16(word_shingles('a b c d', 1)) AS sh,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  token_stats('the quick fox').n_stop AS n_stop,
        |  linear_score(word_shingles('a b c d', 1), 64) AS lin
        |""".stripMargin).head()
    assert(r.getSeq[String](0).size === 4)
    assert(r.getInt(1) === 2)
    assert(r.getString(2).length === 16)
    assert(r.getDouble(3) === 11.0)
    assert(r.getInt(4) === 1)
    assert(r.getDouble(5) >= -1.0 && r.getDouble(5) <= 1.0)
  }

  test("TokenStatsExpr == size/aggregate/filter HOF chain on random text") {
    import spark.implicits._
    import graft.functions.expressions.TokenStatsExpr
    val declTokens = filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
    val texts = (0 until 200).map(_ => randText()) :+ "" :+ "the a of" :+ "!!!"
    val rows = texts.toDF("text")
      .select(
        TokenStatsExpr.tokenStatsNative(col("text")).as("native"),
        size(declTokens).as("d_n"),
        aggregate(declTokens, lit(0L), (acc, t) => acc + length(t)).as("d_sum"),
        size(filter(declTokens,
          t => t.isInCollection(TokenStatsExpr.stopwords))).as("d_stop"))
      .collect()
    rows.foreach { r =>
      val s = r.getStruct(0)
      assert(s.getInt(0) === r.getInt(1))
      assert(s.getLong(1) === r.getLong(2))
      assert(s.getInt(2) === r.getInt(3))
    }
  }

  test("LinearScoreExpr == declarative md5-bucket/md5-weight mean formula") {
    import spark.implicits._
    import graft.functions.expressions.LinearScoreExpr
    val dims = 64
    def weight(f: org.apache.spark.sql.Column) = {
      val bucket = pmod(conv(substring(md5(f), 1, 8), 16, 10).cast("long"), lit(dims))
      conv(substring(md5(concat(lit("w|"), bucket.cast("string"))), 1, 8), 16, 10)
        .cast("long").cast("double") / 4294967296.0 * 2.0 - 1.0
    }
    val texts = (0 until 200).map(_ => randText()).filter(_.exists(_.isLetterOrDigit))
    val rows = texts.toDF("text")
      .select(ShinglesExpr.shinglesNative(col("text"), 1).as("feats"))
      .filter(size(col("feats")) > 0)
      .select(
        LinearScoreExpr.linearScoreNative(col("feats"), dims).as("native"),
        (aggregate(transform(col("feats"), weight(_)), lit(0.0), (a, x) => a + x) /
          size(col("feats"))).as("declarative"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("native expressions keep the plan UDF-free and support codegen") {
    import spark.implicits._
    val plan = Seq(("a b c d", Seq(1.0, 2.0)))
      .toDF("text", "v")
      .select(
        MinhashSigExpr.minhashSigNative(ShinglesExpr.shinglesNative(col("text"), 3), 4),
        DotProductExpr.dotNative(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }
}

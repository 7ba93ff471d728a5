package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tokenizer

/** BPE tokenizer-induction registrations. The oracle unrolls the merge
  * rounds CTE-by-CTE (like the PageRank/label-propagation oracles),
  * replaying the same double-space `replace` trick over the same
  * word-count reduction.
  */
object TokenizerQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private val ROUNDS = 3
  private val SEG_TOP = 20

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The first 3 learned BPE merges with their winning adjacency counts.
    "tok_bpe_merges" -> ((s, dir) =>
      Tokenizer.bpeMerges(docs(s, dir), ROUNDS)),

    // The 20 most frequent words segmented by those merges — BPE's
    // inference half over the learned vocabulary.
    "tok_bpe_segment" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = Tokenizer.bpeMerges(d, ROUNDS)
        .orderBy("merge_rank").collect().map(_.getString(1)).toSeq
      val top = Tokenizer.wordCounts(d)
        .orderBy(col("cnt").desc, col("word")).limit(SEG_TOP)
      Tokenizer.bpeSegment(top, merges)
        .select(col("word"), col("cnt"), col("segmented"))
        .orderBy("word")
    }),

    // SentencePiece-style alphabet selection: character frequencies with
    // cumulative coverage and the in-alphabet cut at 99.5%.
    "tok_char_coverage" -> ((s, dir) =>
      Tokenizer.charCoverage(docs(s, dir), coverage = COVERAGE))
  )

  private val COVERAGE = 0.995

  // ---- oracles ----

  private val toksSql = DuckSql.tokens("text")

  /** CTE chain: wc → seq0 → (p1, seq1) → … carrying (word, cnt, s). */
  private def bpeCtes(rounds: Int): String = {
    val base =
      s"""wc AS (
         |  SELECT word, count(*) AS cnt FROM (
         |    SELECT unnest($toksSql) AS word FROM documents)
         |  GROUP BY word),
         |seq0 AS (
         |  SELECT word, cnt, array_to_string(string_split(word, ''), '  ') AS s
         |  FROM wc)""".stripMargin
    val steps = (1 to rounds).map { r =>
      val prev = s"seq${r - 1}"
      s"""p$r AS (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(list_transform(
         |      range(1, len(string_split(s, '  '))),
         |      i -> string_split(s, '  ')[i] || '  ' || string_split(s, '  ')[i+1]))
         |      AS pair
         |    FROM $prev)
         |  GROUP BY pair ORDER BY c DESC, pair LIMIT 1),
         |seq$r AS (
         |  SELECT word, cnt, replace(s, (SELECT pair FROM p$r),
         |    replace((SELECT pair FROM p$r), '  ', '')) AS s
         |  FROM $prev)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  val oracles: Map[String, String] = Map(

    "tok_bpe_merges" -> {
      val rows = (1 to ROUNDS).map { r =>
        s"""SELECT $r AS merge_rank, replace(pair, '  ', ' ') AS pair,
           |  replace(pair, '  ', '') AS merged, c AS pair_count FROM p$r""".stripMargin
      }.mkString("\nUNION ALL ")
      s"WITH ${bpeCtes(ROUNDS)}\n$rows\nORDER BY merge_rank"
    },

    "tok_bpe_segment" ->
      s"""WITH ${bpeCtes(ROUNDS)}
         |SELECT word, cnt, replace(s, '  ', ' ') AS segmented
         |FROM seq$ROUNDS
         |QUALIFY row_number() OVER (ORDER BY cnt DESC, word) <= $SEG_TOP
         |ORDER BY word""".stripMargin,

    // Full-key ordering (cnt DESC, ch) makes the default RANGE frame
    // row-equivalent, so the running sum matches Spark's window exactly.
    "tok_char_coverage" ->
      s"""WITH cc AS (
         |  SELECT ch, count(*) AS cnt
         |  FROM (SELECT unnest(string_split(lower(text), '')) AS ch
         |        FROM documents)
         |  WHERE ch <> '' GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM cc),
         |rk AS (SELECT ch, cnt,
         |         sum(cnt) OVER (ORDER BY cnt DESC, ch) AS cum
         |       FROM cc)
         |SELECT ch, cnt, round(cum / total, 6) AS cum_share,
         |  (cum - cnt) < total * $COVERAGE AS in_alphabet
         |FROM rk CROSS JOIN tot
         |ORDER BY cnt DESC, ch""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tokenizer
import graft.operators.Iterate.MaterializeOps

/** BPE tokenizer-induction registrations. The oracle unrolls the merge
  * rounds CTE-by-CTE (like the PageRank/label-propagation oracles),
  * replaying the same double-space `replace` trick over the same
  * word-count reduction.
  */
object TokenizerQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/documents.parquet")
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
      // one corpus tokenization per query (r20): the word-count table
      // is cut once and feeds BOTH the merge trainer and the top-k list
      val wc = Tokenizer.wordCounts(d).materialized
      val merges = Tokenizer.bpeMerges(d, ROUNDS, wc0 = Some(wc))
        .orderBy("merge_rank").collect().map(_.getString(1)).toSeq
      val top = wc
        .orderBy(col("cnt").desc, col("word")).limit(SEG_TOP)
      Tokenizer.bpeSegment(top, merges)
        .select(col("word"), col("cnt"), col("segmented"))
        .orderBy("word")
    }),

    // SentencePiece-style alphabet selection: character frequencies with
    // cumulative coverage and the in-alphabet cut at 99.5%.
    "tok_char_coverage" -> ((s, dir) =>
      Tokenizer.charCoverage(docs(s, dir), coverage = COVERAGE)),

    // Unigram-LM piece inventory: all chars + top-40 weighted multi-char
    // substrings with -ln(cnt/total) costs — the second tokenizer family
    // (Kudo) next to BPE.
    "tok_unigram_pieces" -> ((s, dir) =>
      Tokenizer.unigramPieces(docs(s, dir), maxPieceLen = PIECE_LEN,
        topPieces = TOP_PIECES)
        .orderBy("piece")),

    // The first 3 WordPiece merges: likelihood-scored
    // (pair/(left*right)) instead of BPE's raw adjacency count — the
    // third tokenizer family (Schuster-Nakajima / BERT trainer).
    "tok_wordpiece_merges" -> ((s, dir) =>
      Tokenizer.wordpieceMerges(docs(s, dir), ROUNDS)),

    // Greedy longest-match-first decode (BERT tokenize()) of the top-20
    // bounded words under the learned WordPiece inventory, ## prefix on
    // continuation pieces. The oracle unrolls the greedy walk one
    // position-step per CTE.
    "tok_wordpiece_segment" -> ((s, dir) => {
      val d = docs(s, dir)
      val wc = Tokenizer.wordCounts(d).materialized // one tokenization
      // Model artifacts: merged-piece set (<= ROUNDS entries) and the
      // bounded top-word list — the unigramSegment precedent.
      val merged = Tokenizer.wordpieceMerges(d, ROUNDS, wc0 = Some(wc))
        .collect().map(_.getString(2)).toSet
      val maxLen = if (merged.isEmpty) 1 else merged.map(_.length).max
      val top = wc
        .filter(length(col("word")) <= VIT_MAX_LEN)
        .orderBy(col("cnt").desc, col("word")).limit(SEG_TOP)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      import s.implicits._
      Tokenizer.wordpieceSegment(top, merged, maxLen)
        .toDF("word", "cnt", "segmented")
        .orderBy("word")
    }),

    // Viterbi decode of the 20 most frequent (DP-boundable) words under
    // those piece costs: min-cost segmentation, round-6 partial sums,
    // ties -> smallest split. The oracle unrolls the DP per position.
    "tok_unigram_segment" -> ((s, dir) => {
      val d = docs(s, dir)
      val wc = Tokenizer.wordCounts(d).materialized // one tokenization
      val pieces = Tokenizer.unigramPieces(d, PIECE_LEN, TOP_PIECES,
          wc0 = Some(wc))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      val top = wc
        .filter(length(col("word")) <= VIT_MAX_LEN)
        .orderBy(col("cnt").desc, col("word")).limit(SEG_TOP)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      import s.implicits._
      Tokenizer.unigramSegment(top, pieces, PIECE_LEN)
        .toDF("word", "cnt", "segmented", "vit_cost")
        .orderBy("word")
    })
  )

  private val COVERAGE = 0.995
  private val PIECE_LEN = 4
  private val TOP_PIECES = 40
  private val VIT_MAX_LEN = 16

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

  /** Shared piece-inventory CTEs ending in `pieces(piece, cnt, nlp)`. */
  private def pieceCtes: String =
    s"""wc AS MATERIALIZED (
       |  SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest($toksSql) AS word FROM documents)
       |  GROUP BY word),
       |pcand AS (
       |  SELECT substring(word, i.range::INTEGER + 1, l.range::INTEGER) AS piece, cnt
       |  FROM wc, range(0, 64) i, range(1, ${PIECE_LEN + 1}) l
       |  WHERE i.range < least(length(word), 64)
       |    AND i.range + l.range <= length(word)),
       |pcs AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM pcand GROUP BY piece),
       |pkept AS (
       |  SELECT * FROM pcs WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT * FROM (SELECT * FROM pcs WHERE length(piece) > 1
       |    ORDER BY cnt DESC, piece LIMIT $TOP_PIECES)),
       |ptot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM pkept),
       |pieces AS MATERIALIZED (
       |  SELECT piece, cnt, (floor((-ln(cnt / total)) * 1e6 + 0.5) / 1e6) AS nlp
       |  FROM pkept CROSS JOIN ptot)""".stripMargin

  /** Viterbi DP unrolled one position per CTE: v_j holds each word's
    * best (cost, seg) ending at char j; candidates join the piece table
    * on the (i, j] substring, rank by (round-6 cost, split point i). */
  private def vitCtes: String = {
    val v0 =
      """topw AS MATERIALIZED (
        |  SELECT word, cnt FROM wc
        |  WHERE length(word) <= %d
        |  ORDER BY cnt DESC, word LIMIT %d),
        |v0 AS (SELECT word, cnt, 0 AS j, 0.0 AS cost, '' AS seg FROM topw)"""
        .stripMargin.format(VIT_MAX_LEN, SEG_TOP)
    val steps = (1 to VIT_MAX_LEN).map { j =>
      val prevUnion = (math.max(0, j - PIECE_LEN) until j)
        .map(i => s"SELECT * FROM v$i").mkString(" UNION ALL ")
      s"""v$j AS MATERIALIZED (
         |  SELECT word, cnt, $j AS j, cost, seg FROM (
         |    SELECT a.word, a.cnt,
         |      (floor((a.cost + p.nlp) * 1e6 + 0.5) / 1e6) AS cost,
         |      CASE WHEN a.seg = '' THEN p.piece
         |        ELSE a.seg || ' ' || p.piece END AS seg,
         |      row_number() OVER (PARTITION BY a.word
         |        ORDER BY (floor((a.cost + p.nlp) * 1e6 + 0.5) / 1e6), a.j) AS rk
         |    FROM ($prevUnion) a
         |    JOIN pieces p
         |      ON p.piece = substring(a.word, a.j + 1, $j - a.j)
         |    WHERE length(a.word) >= $j)
         |  WHERE rk = 1)""".stripMargin
    }
    (v0 +: steps).mkString(",\n")
  }

  /** WordPiece CTE chain: wc → seq0 → (ws1, wp1, wseq1) → … . Per round,
    * ws holds the weighted SYMBOL counts of the current sequences, wp
    * the single winning pair by round-9 likelihood score, wseq the
    * rewritten sequences — the bpeCtes shape plus the score join.
    */
  private def wordpieceCtes(rounds: Int): String = {
    val base =
      s"""wc AS (
         |  SELECT word, count(*) AS cnt FROM (
         |    SELECT unnest($toksSql) AS word FROM documents)
         |  GROUP BY word),
         |wseq0 AS (
         |  SELECT word, cnt, array_to_string(string_split(word, ''), '  ') AS s
         |  FROM wc)""".stripMargin
    val steps = (1 to rounds).map { r =>
      val prev = s"wseq${r - 1}"
      s"""ws$r AS (
         |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(string_split(s, '  ')) AS sym FROM $prev)
         |  GROUP BY sym),
         |wp$r AS (
         |  SELECT pr.pair, pr.pc, sl.c AS lc, sr.c AS rc,
         |    (floor((pr.pc / (CAST(sl.c AS DOUBLE) * sr.c)) * 1e9 + 0.5) / 1e9) AS score
         |  FROM (
         |    SELECT pair, CAST(sum(cnt) AS BIGINT) AS pc FROM (
         |      SELECT cnt, unnest(list_transform(
         |        range(1, len(string_split(s, '  '))),
         |        i -> string_split(s, '  ')[i] || '  ' || string_split(s, '  ')[i+1]))
         |        AS pair
         |      FROM $prev)
         |    GROUP BY pair) pr
         |  JOIN ws$r sl ON sl.sym = string_split(pr.pair, '  ')[1]
         |  JOIN ws$r sr ON sr.sym = string_split(pr.pair, '  ')[2]
         |  ORDER BY score DESC, pr.pair LIMIT 1),
         |wseq$r AS (
         |  SELECT word, cnt, replace(s, (SELECT pair FROM wp$r),
         |    replace((SELECT pair FROM wp$r), '  ', '')) AS s
         |  FROM $prev)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** Greedy longest-match walk unrolled one piece-step per CTE: wg_k
    * holds each word's (pos, seg) after k pieces; finished words carry.
    * At each step the longest merged piece matching at pos wins, else
    * the single character — exactly [[Tokenizer.wordpieceSegment]].
    */
  private def wordpieceSegCtes: String = {
    val v0 =
      s"""wmv AS MATERIALIZED (
         |  SELECT DISTINCT replace(pair, '  ', '') AS piece
         |  FROM (${(1 to ROUNDS).map(r => s"SELECT pair FROM wp$r").mkString(" UNION ALL ")})),
         |wtopw AS MATERIALIZED (
         |  SELECT word, cnt FROM wc
         |  WHERE length(word) <= $VIT_MAX_LEN
         |  ORDER BY cnt DESC, word LIMIT $SEG_TOP),
         |wg0 AS (SELECT word, cnt, 0 AS pos, '' AS seg FROM wtopw)""".stripMargin
    val steps = (1 to VIT_MAX_LEN).map { k =>
      val prev = s"wg${k - 1}"
      s"""wg$k AS MATERIALIZED (
         |  SELECT word, cnt, pos, seg FROM $prev WHERE pos >= length(word)
         |  UNION ALL
         |  SELECT word, cnt, pos + length(piece) AS pos,
         |    CASE WHEN seg = '' THEN piece
         |      ELSE seg || ' ##' || piece END AS seg
         |  FROM (
         |    SELECT a.word, a.cnt, a.pos, a.seg,
         |      coalesce(
         |        (SELECT v.piece FROM wmv v
         |         WHERE length(v.piece) <= length(a.word) - a.pos
         |           AND substring(a.word, a.pos + 1, length(v.piece)) = v.piece
         |         ORDER BY length(v.piece) DESC LIMIT 1),
         |        substring(a.word, a.pos + 1, 1)) AS piece
         |    FROM $prev a WHERE a.pos < length(a.word)))""".stripMargin
    }
    (v0 +: steps).mkString(",\n")
  }

  val oracles: Map[String, String] = Map(

    "tok_unigram_pieces" ->
      s"""WITH $pieceCtes
         |SELECT piece, cnt, nlp FROM pieces ORDER BY piece""".stripMargin,

    "tok_unigram_segment" -> {
      val vAll = (1 to VIT_MAX_LEN)
        .map(j => s"SELECT * FROM v$j").mkString(" UNION ALL ")
      s"""WITH $pieceCtes,
         |$vitCtes
         |SELECT word, cnt, seg AS segmented, cost AS vit_cost
         |FROM ($vAll) WHERE j = length(word)
         |ORDER BY word""".stripMargin
    },

    "tok_wordpiece_merges" -> {
      val rows = (1 to ROUNDS).map { r =>
        s"""SELECT $r AS merge_rank, replace(pair, '  ', ' ') AS pair,
           |  replace(pair, '  ', '') AS merged, pc AS pair_count,
           |  lc AS left_count, rc AS right_count, score FROM wp$r""".stripMargin
      }.mkString("\nUNION ALL ")
      s"WITH ${wordpieceCtes(ROUNDS)}\n$rows\nORDER BY merge_rank"
    },

    "tok_wordpiece_segment" ->
      s"""WITH ${wordpieceCtes(ROUNDS)},
         |$wordpieceSegCtes
         |SELECT word, cnt, seg AS segmented FROM wg$VIT_MAX_LEN
         |ORDER BY word""".stripMargin,

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
         |SELECT ch, cnt, (floor((cum / total) * 1e6 + 0.5) / 1e6) AS cum_share,
         |  (cum - cnt) < total * $COVERAGE AS in_alphabet
         |FROM rk CROSS JOIN tot
         |ORDER BY cnt DESC, ch""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Deduplication registrations (EX3/EX10 + north-star dedup set) over the
  * `documents` table, each replayed exactly by the DuckDB oracle (md5 is
  * the shared hash family — see operators.Dedup).
  */
object DedupQueries extends QueryPack {

  // Single-file parquet tables scan as ONE partition; repartition so the
  // narrow per-document work parallelizes (at real scale the table is
  // many files and this is a no-op cost).
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private val K = 16      // minhash signature length
  private val BANDS = 4   // LSH bands (4 rows per band)
  // Floor for the dedup_lsh_recall contract — measured recall sits well
  // above it at the driver SFs (4-row bands at t=0.5 catch most true
  // pairs); the boolean flips only on a real banding regression.
  private val LSH_RECALL_FLOOR = 0.5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // EX3: exact dedup by content digest, deterministic survivor.
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir))
        .select(col("doc_id"), col("content_md5"))
        .orderBy("doc_id")),

    // URL-level dedup after canonicalization: per-doc synthetic URLs
    // carry case / default-port / fragment / param-order noise; the
    // canonicalizer (pure codegen'd string expressions, functions/Urls)
    // must collapse each group to ONE canonical key, which the oracle
    // predicts in closed form from the generator. Zero extra shuffles
    // beyond the group-by on the canonical key.
    "dedup_url_canonical" -> ((s, dir) => {
      val d = docs(s, dir)
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("http")).otherwise(lit("HTTP")),
        lit("://"),
        when(col("doc_id") % 4 === 0, lit("Docs.")).otherwise(lit("docs.")),
        col("source"), lit(".Example.com"),
        when(col("doc_id") % 3 === 0, lit(":80")).otherwise(lit("")),
        lit("/corpus/"), (col("doc_id") % 25).cast("string"),
        when(col("doc_id") % 2 === 0,
          concat(lit("?a=1&b="), (col("doc_id") % 5).cast("string")))
          .otherwise(concat(lit("?b="), (col("doc_id") % 5).cast("string"),
            lit("&a=1"))),
        lit("#sec"), col("doc_id").cast("string"))
      d.select(graft.functions.Urls.canonicalize(url).as("canonical_url"),
          col("doc_id"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"))
        .orderBy("canonical_url")
    }),

    // EX10a: minhash signatures (16 md5-minima over word 3-gram shingles).
    "dedup_minhash_sigs" -> ((s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), n = 3, k = K)
        .select(col("doc_id"), array_join(col("sig"), ",").as("sig"))
        .orderBy("doc_id")),

    // EX10b: full minhash-LSH near-dup pipeline (bands → candidates →
    // exact-Jaccard verify). Threshold 0.5; unit tests cover recall on
    // constructed near-dups, this checks the pipeline end-to-end.
    "dedup_lsh_pairs" -> ((s, dir) =>
      Dedup.nearDupPairs(docs(s, dir), n = 3, k = K, bands = BANDS, threshold = 0.5)
        .orderBy("a", "b")),

    // EX10c: near-dup cluster assignment — connected components over the
    // LSH pairs (iterative min-label propagation), giving each paired doc
    // its cluster representative (min reachable doc_id). The oracle walks
    // the same pair graph with a recursive CTE.
    "dedup_near_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.nearDupPairs(docs(s, dir), n = 3, k = K, bands = BANDS, threshold = 0.5))
        .orderBy("doc_id")),

    // Estimator-quality table: the pairs the STREAMING near-dup detector
    // admits (signature estimate >= 0.5 — its bounded-state
    // verification), with the exact shingle Jaccard alongside
    // (operators/Dedup.sigEstimatorPairs; streaming/NearDupStream).
    "dedup_sig_estimator" -> ((s, dir) =>
      Dedup.sigEstimatorPairs(docs(s, dir), n = 3, k = K, bands = BANDS,
        threshold = 0.5)
        .orderBy("a", "b")),

    // Measured LSH recall contract: of ALL true Jaccard >= 0.5 pairs
    // (shingle-overlap inverted index — the exact side), the fraction
    // the banded pipeline surfaces — the (k, bands) dial quantified,
    // with the floor asserted as an oracle-replayed boolean (the ANN
    // recall pattern). Duplicate partners are scattered across the id
    // space, so the truth side runs unsampled.
    "dedup_lsh_recall" -> ((s, dir) =>
      Dedup.lshRecall(docs(s, dir), n = 3, k = K, bands = BANDS,
        threshold = 0.5, minRecall = LSH_RECALL_FLOOR)),

    // SimHash fingerprints (16-bit, md5-nibble votes).
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir))
        .orderBy("doc_id")),

    // Sentence-level exact dedup (CCNet/RefinedWeb line-dedup rule):
    // first occurrence of each sentence survives, docs reassembled.
    "dedup_sentences" -> ((s, dir) =>
      Dedup.dedupSentences(docs(s, dir))
        .orderBy("doc_id")),

    // Exact n-gram Jaccard near-dup, blocked by (lang, source): top-20
    // most-similar pairs, via an inverted-index join — explode distinct
    // shingles, self-join on (lang, source, shingle), so |A∩B| is the
    // per-pair match count and only pairs sharing ≥1 shingle are ever
    // materialized (the block cross-product never exists; the earlier
    // broadcast-cross form intersected 159k full pairs at sf0.1). |A∪B| =
    // |A|+|B|−|A∩B| from a shuffle-joined per-doc size table. At 100 TB this
    // is the scalable form: the shuffle key is the shingle (near-uniform),
    // fan-out is bounded by shingle frequency, and zero-overlap pairs are
    // never enumerated — sound for top-k as long as ≥k overlapping pairs
    // exist (150 at sf0.01, 14.5k at sf0.1).
    // Max-containment (asymmetric overlap) top-20: flags subset/quote
    // relations Jaccard scores near 0; same inverted-index blocking.
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentTopK(docs(s, dir), n = 3,
        blockCols = Seq("lang", "source"), topK = 20)),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      import graft.functions.TextFns
      val d = docs(s, dir).select(col("doc_id"), col("lang"), col("source"),
        array_distinct(TextFns.textShingles(col("text"), 3)).as("sh"))
      val sizes = d.select(col("doc_id"), size(col("sh")).as("sz"))
      val ex = d.select(col("lang"), col("source"), col("doc_id"),
        explode(col("sh")).as("shingle"))
      val a = ex.select(col("lang"), col("source"), col("doc_id").as("a"), col("shingle"))
      val b = ex.select(col("lang"), col("source"), col("doc_id").as("b"), col("shingle"))
      a.join(b, Seq("lang", "source", "shingle"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
        // plain joins: `sizes` is one row PER DOCUMENT — corpus-sized, so a
        // forced broadcast would die at the broadcast limit at 100 TB. AQE
        // still broadcasts it adaptively at small scale from runtime sizes;
        // at scale it degrades to a shuffle join (same form as lshRecall's
        // size join in operators/Dedup.scala).
        .join(sizes.select(col("doc_id").as("a"), col("sz").as("sz_a")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("sz").as("sz_b")), "b")
        .select(col("a"), col("b"),
          (floor((col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter"))) * 1e6 + 0.5) / 1e6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Quality-aware survivor per near-dup cluster: the longest member
    // (ties → lowest doc_id) survives instead of the min-id rep — one
    // max_by aggregate over the cluster assignment, no window sort.
    "dedup_best_survivors" -> ((s, dir) => {
      val d = docs(s, dir)
      val clusters = Dedup.connectedComponents(
        Dedup.nearDupPairs(d, n = 3, k = K, bands = BANDS, threshold = 0.5))
      Dedup.bestSurvivors(clusters, d, scoreCol = "n_chars")
        .orderBy("cluster_rep")
    }),

    // Incremental cross-batch near-dup: docs with doc_id % 5 == 0 play the
    // "new batch" arriving against the corpus of the rest — each batch doc
    // gets its best corpus match (Jaccard ≥ 0.5) or is_new for admission.
    // The corpus is only ever touched through its band index + shingle
    // sets; no corpus self-pairing, no corpus-sized broadcast.
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalNearDups(
        d.filter(col("doc_id") % 5 =!= 0),
        d.filter(col("doc_id") % 5 === 0),
        n = 3, k = K, bands = BANDS, threshold = 0.5)
        .orderBy("doc_id")
    }),

    // Deterministic stratified sample: ≤5 docs per (lang, source) stratum
    // in md5(doc_id) order — layout-independent, RNG-free, and the
    // rank ≤ k predicate compiles to Partial+Final WindowGroupLimit so
    // each map task keeps at most 5 rows per stratum before the shuffle.
    "sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      docs(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("source"), col("doc_id"))
        .orderBy("lang", "source", "doc_id")
    })
  )

  private val toksSql = DuckSql.tokens("text")
  private val shinglesSql = DuckSql.shingles3("toks")

  private def sigsCte: String = {
    val mins = (0 until K).map(i => DuckSql.minhash("shingles", i)).mkString(",\n    ")
    s"""shingled AS (
       |  SELECT doc_id, $shinglesSql AS shingles
       |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
       |sigs AS (
       |  SELECT doc_id, shingles, [
       |    $mins] AS sig
       |  FROM shingled)""".stripMargin
  }

  // Shared oracle chain (DuckSql.lshChain): shingles → sigs → bands →
  // candidate pairs → rounded exact-Jaccard (`verified`), over documents.
  private val lshChainCtes: String = DuckSql.lshChain("documents", 3, K, BANDS)

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id, md5(text) AS content_md5 FROM documents
        |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin,

    // ground-truth canonical form predicted in closed form from the URL
    // generator — an engine-side canonicalization bug (missed port, kept
    // fragment, unsorted params, case leak) breaks the group keys
    "dedup_url_canonical" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    'http://docs.' || source || '.example.com/corpus/' ||
        |    (doc_id % 25)::VARCHAR || '?a=1&b=' || (doc_id % 5)::VARCHAR
        |      AS canonical_url
        |  FROM documents)
        |SELECT canonical_url, count(*) AS n_variants,
        |  min(doc_id) AS first_doc
        |FROM c GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,

    "dedup_minhash_sigs" ->
      s"""WITH $sigsCte
         |SELECT doc_id, array_to_string(sig, ',') AS sig FROM sigs ORDER BY doc_id""".stripMargin,

    "dedup_lsh_pairs" ->
      s"""WITH $lshChainCtes
         |SELECT a, b, jaccard FROM verified
         |WHERE jaccard >= 0.5
         |ORDER BY a, b""".stripMargin,

    "dedup_sig_estimator" ->
      s"""WITH $lshChainCtes,
         |est AS (
         |  SELECT c.a, c.b,
         |    (floor((CAST(list_sum(list_transform(range(1, $K + 1),
         |      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
         |      AS DOUBLE) / $K) * 1e6 + 0.5) / 1e6) AS sig_est
         |  FROM cands c
         |  JOIN sigs sa ON c.a = sa.doc_id
         |  JOIN sigs sb ON c.b = sb.doc_id)
         |SELECT e.a, e.b, e.sig_est, v.jaccard
         |FROM est e JOIN verified v ON e.a = v.a AND e.b = v.b
         |WHERE e.sig_est >= 0.5
         |ORDER BY e.a, e.b""".stripMargin,

    "dedup_near_clusters" ->
      s"""WITH RECURSIVE $lshChainCtes,
         |${DuckSql.componentCtes(0.5)}
         |SELECT doc_id, cluster_rep FROM comp ORDER BY doc_id""".stripMargin,

    "dedup_lsh_recall" -> {
      s"""WITH $lshChainCtes,
         |fnd AS (SELECT count(*) AS n_found FROM verified
         |  WHERE jaccard >= 0.5),
         |dd AS (SELECT doc_id, list_distinct($shinglesSql) AS sh
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
         |tp AS (SELECT count(*) AS n_true FROM (
         |    SELECT len(list_filter(x.sh, e -> list_contains(y.sh, e))) AS inter,
         |      len(x.sh) + len(y.sh)
         |        - len(list_filter(x.sh, e -> list_contains(y.sh, e))) AS uni
         |    FROM dd x JOIN dd y ON x.doc_id < y.doc_id)
         |  WHERE inter > 0 AND (floor((CAST(inter AS DOUBLE) / uni) * 1e6 + 0.5) / 1e6) >= 0.5)
         |SELECT n_true, n_found,
         |  CASE WHEN n_true = 0 THEN CAST(1.0 AS DOUBLE)
         |    ELSE (floor((n_found::DOUBLE / n_true) * 1e4 + 0.5) / 1e4) END AS recall,
         |  true AS recall_ok
         |FROM tp CROSS JOIN fnd""".stripMargin
    },

    "dedup_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |votes AS (
         |  SELECT doc_id, p.range AS pos,
         |    sum(CASE WHEN regexp_matches(substr(md5(tok), CAST(p.range AS INTEGER), 1), '[89a-f]')
         |      THEN 1 ELSE -1 END) AS v
         |  FROM toks, range(1, 17) p
         |  GROUP BY doc_id, p.range)
         |SELECT doc_id,
         |  string_agg(CASE WHEN v >= 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS simhash16
         |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_sentences" ->
      """WITH sent AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, '. '), 1) - 1 AS pos,
        |    unnest(string_split(text, '. ')) AS sentence
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM sent
        |  QUALIFY row_number() OVER (PARTITION BY sentence ORDER BY doc_id, pos) = 1)
        |SELECT doc_id, count(*) AS n_kept,
        |  md5(string_agg(sentence, '. ' ORDER BY pos)) AS rebuilt_md5
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_containment" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, source,
         |    list_distinct($shinglesSql) AS sh
         |  FROM (SELECT doc_id, lang, source, $toksSql AS toks FROM documents)),
         |pairs AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b,
         |    len(list_filter(x.sh, e -> list_contains(y.sh, e))) AS inter,
         |    least(len(x.sh), len(y.sh)) AS mn
         |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
         |  WHERE x.doc_id < y.doc_id)
         |SELECT a, b, (floor((CAST(inter AS DOUBLE) / mn) * 1e6 + 0.5) / 1e6) AS containment
         |FROM pairs
         |WHERE inter > 0
         |ORDER BY containment DESC, a, b LIMIT 20""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, source,
         |    list_distinct($shinglesSql) AS sh
         |  FROM (SELECT doc_id, lang, source, $toksSql AS toks FROM documents)),
         |pairs AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b,
         |    len(list_filter(x.sh, e -> list_contains(y.sh, e))) AS inter,
         |    len(x.sh) + len(y.sh) - len(list_filter(x.sh, e -> list_contains(y.sh, e))) AS uni
         |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
         |  WHERE x.doc_id < y.doc_id)
         |SELECT a, b, (floor((CAST(inter AS DOUBLE) / uni) * 1e6 + 0.5) / 1e6) AS jaccard
         |FROM pairs
         |WHERE inter > 0
         |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin,

    "dedup_best_survivors" ->
      s"""WITH RECURSIVE $lshChainCtes,
         |${DuckSql.componentCtes(0.5)}
         |SELECT cluster_rep, doc_id AS survivor_id, n_chars AS survivor_n_chars
         |FROM comp JOIN documents USING (doc_id)
         |QUALIFY row_number() OVER (PARTITION BY cluster_rep
         |  ORDER BY n_chars DESC, doc_id) = 1
         |ORDER BY cluster_rep""".stripMargin,

    "dedup_incremental" ->
      s"""WITH ${DuckSql.lshChain("documents", 3, K, BANDS,
             candsWhere = "x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0")},
         |best AS (
         |  SELECT b AS doc_id, a AS match_id, jaccard AS match_jaccard
         |  FROM verified WHERE jaccard >= 0.5
         |  QUALIFY row_number() OVER (PARTITION BY b
         |    ORDER BY jaccard DESC, a) = 1)
         |SELECT n.doc_id, match_id IS NULL AS is_new,
         |  coalesce(match_id, -1) AS match_id,
         |  coalesce(match_jaccard, -1.0) AS match_jaccard
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) n
         |LEFT JOIN best USING (doc_id)
         |ORDER BY n.doc_id""".stripMargin,

    "sample_stratified" ->
      """SELECT lang, source, doc_id FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang, source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 5
        |ORDER BY lang, source, doc_id""".stripMargin
  )
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Iterate.MaterializeOps

/** Deduplication operators for the LLM-data-pipeline surface (EX3/EX10 +
  * north-star dedup set): exact, minhash-LSH, simhash, n-gram Jaccard.
  *
  * Scale posture (100 TB): exact dedup is one hash-shuffle on the content
  * digest (not the content); minhash-LSH shuffles (band_id, band_hash)
  * pairs — candidate generation never compares all pairs, and the
  * verification join only touches LSH candidates. All hashes are md5 so
  * the DuckDB oracle can replay them bit-for-bit.
  */
object Dedup {

  /** Exact dedup by content digest, deterministic survivor (lowest id).
    * `min_by` over the digest is an ordinary aggregate, so partial
    * aggregation collapses map-local duplicates BEFORE the shuffle and no
    * per-group sort happens after it (the row_number-window form shuffles
    * and sorts every row). Shuffle key is the 32-byte digest, not the body.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val withDigest = docs.withColumn("content_md5", md5(col(textCol)))
    val cols = withDigest.columns
    withDigest
      .groupBy(col("content_md5"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .select(cols.map(c => col(s"_row.$c")): _*)
  }

  /** Minhash signatures: k md5-minima over word n-gram shingles, via the
    * native [[graft.functions.expressions.MinhashSigExpr]] (the same
    * signature path the LSH pipeline's fused band expression uses — one
    * tight-loop traversal per document, not an interpreted HOF fold).
    */
  def minhashSignatures(docs: DataFrame, n: Int, k: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), TextFns.textShingles(col(textCol), n).as("shingles"))
      .withColumn("sig",
        graft.functions.expressions.MinhashSigExpr.minhashSigNative(col("shingles"), k))

  /** Exact Jaccard over distinct shingle sets for given candidate pairs.
    * Empty∪empty would be 0/0 = NaN — and Spark orders NaN above every
    * number, so an unguarded `>= threshold` would pass; emit null instead
    * (the DuckDB oracle emits nothing for such pairs, and callers filter
    * with a comparison that null fails).
    */
  def jaccardVerify(candidates: DataFrame, shingleSets: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val sets = shingleSets.select(col(idCol).as("doc_id"), col("shingles"))
    jaccardVerifyCross(candidates, sets, sets)
  }

  /** [[jaccardVerify]] where the `a` and `b` sides of each candidate pair
    * resolve against DIFFERENT `(doc_id, shingles)` frames — the
    * cross-batch form ([[incrementalNearDups]] verifies new-batch docs
    * against corpus docs, so the two sides come from different tables).
    */
  def jaccardVerifyCross(candidates: DataFrame, aShingled: DataFrame,
      bShingled: DataFrame): DataFrame = {
    val sa = aShingled.select(col("doc_id").as("a"), array_distinct(col("shingles")).as("sh_a"))
    val sb = bShingled.select(col("doc_id").as("b"), array_distinct(col("shingles")).as("sh_b"))
    val uni = size(array_union(col("sh_a"), col("sh_b")))
    candidates.join(sa, "a").join(sb, "b")
      .withColumn("jaccard", when(uni === 0, lit(null)).otherwise(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") / uni))
      .select(col("a"), col("b"), (floor((col("jaccard")) * 1e6 + 0.5) / 1e6).as("jaccard"))
  }

  /** MinHash-LSH near-dup pipeline: fused shingle→minhash→band hashing
    * (one native expression per side, computed once per document) →
    * banded candidate self-join → exact-Jaccard verification → pairs with
    * jaccard ≥ threshold.
    *
    * Documents with no shingles (fewer than n tokens) generate no banded
    * rows (LshBandsExpr emits an empty band array), so they can never
    * pair — the round-1 failure mode where all such docs md5'd to one
    * O(m²) NaN-jaccard bucket is structurally gone. No cache: each side
    * evaluates its native expression exactly once, and a cached plan here
    * would leak blocks into long-lived sessions (Verify/Bench run every
    * query in one session).
    */
  def nearDupPairs(docs: DataFrame, n: Int = 3, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // Materialize the shingle frame ONCE: downstream references it three
    // times (band index + both Jaccard-verify sides), and without the
    // boundary each reference re-tokenizes the corpus. This is the
    // in-session stand-in for the persisted shingle/band storage a 100 TB
    // deployment keeps per corpus generation (see bandIndex).
    nearDupPairsFromShingles(
      shingleFrame(docs, n, textCol, idCol).materialized,
      k, bands, threshold)

  /** Measured LSH recall: of all TRUE near-dup pairs (exact n-gram
    * Jaccard ≥ `threshold`) in `docs`, the fraction the banded
    * [[nearDupPairs]] pipeline surfaces — the dedup counterpart of the
    * ANN recall contracts, quantifying the (k, bands) dial that the LSH
    * family otherwise documents in prose. The verify stage makes every
    * surfaced pair a true pair, so recall = found/true exactly; no true
    * pairs ⇒ vacuous 1.0. Emits one row: (n_true, n_found, recall,
    * recall_ok = recall ≥ `minRecall`).
    *
    * The truth side enumerates every pair sharing ≥ 1 shingle via the
    * inverted-index join (the [[containmentTopK]] blocking, unblocked) —
    * that IS the exact computation the LSH layer approximates, so this
    * is a diagnostic you run on a corpus slice or generation, not per
    * batch; fan-out is bounded by shingle frequency, and zero-overlap
    * pairs never materialize.
    */
  /** Band candidates verified by BOTH estimators side by side: the
    * MinHash signature estimate (matching components / k — unbiased for
    * true Jaccard, and the only verification whose state stays bounded
    * regardless of document length, which is why
    * [[graft.streaming.NearDupStream]] uses it in-flight) and the exact
    * shingle-set Jaccard. The threshold applies to the ESTIMATOR, so
    * this emits precisely the pairs the streaming detector would, with
    * the exact value alongside — the estimator-quality table for tuning
    * k against the admission threshold.
    *
    * Scale shape: banded candidates (never all-pairs), one k-element
    * signature zip per surviving pair (bounded arrays — the HOF rule),
    * exact Jaccard only for pairs past the estimator gate.
    *
    * @return (a, b, sig_est, jaccard) ordered pairs, a < b.
    */
  def sigEstimatorPairs(docs: DataFrame, n: Int = 3, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val shingled = shingleFrame(docs, n, textCol, idCol).materialized
    val sigs = shingled.select(col("doc_id"),
      graft.functions.TextFns.minhashSignature(col("shingles"), k).as("sig"))
    val banded = bandIndex(shingled, k, bands)
    val cands = banded
      .select(col("doc_id").as("a"), col("band_id"), col("band_hash"))
      .join(banded.select(col("doc_id").as("b"), col("band_id"),
        col("band_hash")), Seq("band_id", "band_hash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val est = cands
      .join(sigs.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
      .withColumn("sig_est", (floor((matches.cast("double") / k) * 1e6 + 0.5) / 1e6))
      .filter(col("sig_est") >= threshold)
      .select(col("a"), col("b"), col("sig_est"))
    jaccardVerify(est.select(col("a"), col("b")), shingled)
      .join(est, Seq("a", "b"))
      .select(col("a"), col("b"), col("sig_est"), col("jaccard"))
  }

  def lshRecall(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, minRecall: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val shingled = shingleFrame(docs, n, textCol, idCol).materialized
    val found = nearDupPairsFromShingles(shingled, k, bands, threshold)
      .agg(count(lit(1)).as("n_found"))
    val d = shingled.select(col("doc_id"),
      array_distinct(col("shingles")).as("sh"))
    val sizes = d.select(col("doc_id"), size(col("sh")).as("sz"))
    val ex = d.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val truth = ex.select(col("doc_id").as("a"), col("shingle"))
      .join(ex.select(col("doc_id").as("b"), col("shingle")), "shingle")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      // sizes is corpus-sized (one row per doc): plain shuffle joins,
      // never forced broadcasts — AQE may still broadcast small inputs
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sz_a")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("sz_b")), "b")
      .filter((floor((col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter"))) * 1e6 + 0.5) / 1e6) >= threshold)
      .agg(count(lit(1)).as("n_true"))
    truth.crossJoin(broadcast(found))
      .select(col("n_true"), col("n_found"),
        when(col("n_true") === 0, lit(1.0))
          .otherwise((floor((col("n_found").cast("double") / col("n_true")) * 1e4 + 0.5) / 1e4))
          .as("recall"))
      .withColumn("recall_ok", col("recall") >= minRecall)
  }

  /** The LSH band index of a shingled corpus: one `(doc_id, band_id,
    * band_hash)` row per band per document. This is the persistent,
    * incrementally-maintainable form of the near-dup index — in
    * production it is written out once per corpus generation (bucketed by
    * `(band_id, band_hash)` so probe joins need no shuffle on the corpus
    * side) and each new batch appends its own rows after admission.
    */
  def bandIndex(shingled: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    import graft.functions.expressions.LshBandsExpr
    shingled.select(col("doc_id"),
      posexplode(LshBandsExpr.lshBandsNative(col("shingles"), k, bands))
        .as(Seq("band_id", "band_hash")))
  }

  /** [[nearDupPairs]] over a precomputed `(doc_id, shingles)` frame — use
    * when the caller already has (or wants to materialize) the shingle
    * column so it isn't recomputed per plan branch (the self-join + verify
    * reference the shingled frame four times; Curation checkpoints it).
    */
  def nearDupPairsFromShingles(shingled: DataFrame, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val banded = bandIndex(shingled, k, bands)
    val a = banded.select(col("doc_id").as("a"), col("band_id"), col("band_hash"))
    val b = banded.select(col("doc_id").as("b"), col("band_id"), col("band_hash"))
    val cands = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    jaccardVerify(cands, shingled)
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over near-dup pairs — the step that turns pairs
    * into "keep one document per duplicate cluster": every doc appearing
    * in a pair is labeled with the minimum doc id reachable through the
    * pair graph (its cluster representative).
    *
    * Iterative min-label propagation with pointer jumping: each round
    * takes the min over {own label, the label's label (doubling), the
    * neighbors' labels} — two shuffle joins + a min-aggregate per round,
    * converging in O(log diameter) rounds even on path-shaped clusters
    * (plain one-hop propagation needs O(diameter)); this is the standard
    * scalable formulation (no driver-side graph). Lineage is truncated
    * per round (`localCheckpoint`), or the plan would double every
    * iteration. Throws if maxIter rounds don't converge — silently
    * returning partial labels would make survivors keep duplicates.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Materialize the pair pipeline ONCE before mirroring: the union
    // references `pairs` twice, and without this boundary the entire
    // upstream plan (LSH banded join + Jaccard verify when called from
    // nearDupSurvivors) evaluated once per direction — measured ~2× the
    // whole pair-generation cost on dedup_near_clusters.
    val p = pairs.select(col("a"), col("b")).materializedLazy // the count below runs it
    val edgesRaw = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
    // Size the iteration frames to the ACTUAL edge count (known after the
    // checkpoint) instead of inheriting spark.sql.shuffle.partitions: the
    // pair graph is usually minuscule relative to the corpus, and paying
    // dozens of near-empty tasks per round × per join × per round
    // dominated the loop (~1 s/round at 508 edges / 32 partitions).
    val parts = math.max(1, (p.count() * 2 / 2000000L).toInt)
    val edges = edgesRaw.repartition(parts, col("dst")).materializedLazy
    // Seed labels with round 1 already applied: comp₀(v) = min({v} ∪
    // neighbors) is exactly what the first loop round computes from the
    // identity seed (its pointer-jump is a no-op there) — but as ONE
    // partial-aggregable groupBy instead of that round's three joins.
    // Size-2 clusters (the common near-dup case) start converged, so the
    // loop's first iteration is usually also its last.
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("min_nbr"))
      .select(col("src").as("v"), least(col("src"), col("min_nbr")).as("comp"))
      .repartition(parts, col("v")).materializedLazy
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("v").as("dst"), col("comp").as("nbr_comp")), "dst")
        .groupBy(col("src"))
        .agg(min(col("nbr_comp")).as("min_nbr"))
      val jumped = labels
        .join(labels.select(col("v").as("rv"), col("comp").as("rep_comp")),
          col("comp") === col("rv"), "left")
        .select(col("v"), col("comp"),
          coalesce(col("rep_comp"), col("comp")).as("jump_comp"))
      val next = jumped
        .join(nbrMin, col("v") === col("src"), "left")
        .select(col("v"), col("comp").as("old_comp"),
          least(col("comp"), col("jump_comp"),
            coalesce(col("min_nbr"), col("comp"))).as("comp"))
        .materializedLazy // the convergence count below runs the cut
      changed = next.filter(col("comp") < col("old_comp")).count()
      labels = next.select(col("v"), col("comp"))
      i += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(cluster diameter > 2^maxIter is not plausible — check the pair input)")
    labels.select(col("v").as("doc_id"), col("comp").as("cluster_rep"))
  }

  /** Sketch-accelerated duplicate guard (the 100 TB form of D1's
    * anti-join): when the "existing keys" side is too large to broadcast
    * exactly, build a Bloom filter over it (~1.2 GB per 10⁹ keys at 1%
    * fpp vs. the keys themselves), route the definite-new keys around the
    * join entirely, and anti-join ONLY the might-contain subset — false
    * positives cost a join lookup, never a wrong drop, so the result is
    * exactly `candidates ANTI JOIN existing` (property-tested).
    */
  def bloomDupGuard(candidates: DataFrame, existing: DataFrame,
      keyCol: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val spark = candidates.sparkSession
    val bf = existing.stat.bloomFilter(keyCol, math.max(expectedKeys, 1L), fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => s != null && bcast.value.mightContainString(s))
    val definiteNew = candidates.filter(!mightContain(col(keyCol)))
    val maybeDup = candidates.filter(mightContain(col(keyCol)))
      .join(existing.select(col(keyCol).as("_ex_key")),
        col(keyCol) === col("_ex_key"), "left_anti")
    definiteNew.unionByName(maybeDup)
  }

  /** End-to-end near-dup dedup: drop every document whose cluster
    * representative is another document (keep cluster reps and all
    * unpaired docs). The dropped set is a corpus FRACTION (web-corpus dup
    * rates run 30-80%), so the anti-join side must stay planner-chosen:
    * AQE broadcasts it when runtime-small and shuffles at scale. For the
    * huge-side streaming case use [[bloomDupGuard]] instead.
    */
  /** @param shingled optional precomputed `(doc_id, shingles)` frame
    *                  (e.g. checkpointed by Curation) so pair generation
    *                  doesn't re-shingle `docs` per plan branch
    */
  def nearDupSurvivors(docs: DataFrame, n: Int = 3, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id",
      shingled: Option[DataFrame] = None): DataFrame = {
    val sh = shingled.getOrElse(
      docs.select(col(idCol).as("doc_id"),
        TextFns.textShingles(col(textCol), n).as("shingles")))
    val dropped = connectedComponents(
        nearDupPairsFromShingles(sh, k, bands, threshold))
      .filter(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id").as("_drop_id"))
    docs.join(dropped, col(idCol) === col("_drop_id"), "left_anti")
  }

  /** Corpus-wide sentence-level exact dedup (the CCNet/RefinedWeb "line
    * dedup" rule): a sentence appearing in many documents survives only in
    * its first occurrence (lowest (doc_id, position)); every document is
    * reassembled from its surviving sentences in original order.
    * Documents whose every sentence is owned elsewhere vanish — that IS
    * the boilerplate-removal semantic.
    *
    * Scale shape: explode to (sentence, doc_id, pos), ONE shuffle on the
    * sentence text for the first-occurrence pick, one shuffle back on
    * doc_id for reassembly. First-occurrence is `min(struct(doc_id, pos))`
    * — an ordinary aggregate, so Spark's partial aggregation collapses
    * duplicate sentences map-side BEFORE the shuffle (a window form would
    * shuffle and sort every exploded row; the aggregate form shuffles at
    * most one row per distinct sentence per map partition, which is what
    * makes boilerplate-heavy corpora cheap). Reassembly arrays are
    * per-document small, so the collect_list + sort is bounded. Emitted as
    * a digest of the rebuilt text for cross-engine compare.
    */
  def dedupSentences(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", sep: String = ". "): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val sent = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), sepRe)).as(Seq("pos", "sentence")))
    sent.groupBy(col("sentence"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("_first"))
      .select(col("_first.doc_id").as("doc_id"), col("_first.pos").as("pos"),
        col("sentence"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("sentence")))),
            x => x.getField("sentence")),
          sep).as("rebuilt"))
      .select(col("doc_id"), col("n_kept"), md5(col("rebuilt")).as("rebuilt_md5"))
  }

  /** Quality-aware survivor selection per near-dup cluster: instead of the
    * min-id representative, keep the best-scoring member (ties → lowest
    * id). One `max_by` aggregate over the cluster assignment — partial
    * aggregation collapses members map-side, so the shuffle carries at
    * most one candidate per cluster per map partition; no window sort.
    */
  def bestSurvivors(clusters: DataFrame, docs: DataFrame,
      scoreCol: String, idCol: String = "doc_id"): DataFrame =
    clusters.join(docs.select(col(idCol), col(scoreCol)), idCol)
      .groupBy(col("cluster_rep"))
      // min_by over (−score, id): highest score wins, ties → lowest id.
      // Only the (numeric) score is negated — after a double cast, so a
      // Long.MinValue score can't negate to itself — and the id is never
      // negated, so string/any-orderable id columns work.
      .agg(min_by(struct(col(idCol), col(scoreCol)),
        struct((-col(scoreCol).cast("double")).as("neg_score"), col(idCol))).as("_best"))
      .select(col("cluster_rep"),
        col(s"_best.$idCol").as("survivor_id"),
        col(s"_best.$scoreCol").as(s"survivor_$scoreCol"))

  /** Asymmetric-overlap (max-containment) near-dup: for each blocked
    * document pair, |sh(A) ∩ sh(B)| / min(|sh(A)|, |sh(B)|) — Broder's
    * containment measure taken in the direction of the SMALLER set.
    * Jaccard misses subset relations (a paragraph quoted inside a long
    * document scores near 0), containment flags them at 1.0 — the
    * standard second axis for quote/boilerplate detection in corpus
    * dedup.
    *
    * Scale shape: identical to the n-gram Jaccard path — candidate pairs
    * come from an inverted shingle index (explode → self-join on the
    * shingle within `blockCols` blocks), so intersection counts are a
    * partial-aggregable groupBy and only co-shingle pairs ever
    * materialize, never an all-pairs product. Set sizes ride in via a
    * per-doc (doc_id, size) frame that is |docs|-bounded but joined, not
    * broadcast. Top-k is TakeOrderedAndProject.
    */
  def containmentTopK(docs: DataFrame, n: Int, blockCols: Seq[String],
      topK: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val block = blockCols.map(col)
    val d = docs.select(block :+ col(idCol).as("doc_id") :+
      array_distinct(TextFns.textShingles(col(textCol), n)).as("sh"): _*)
    val sizes = d.select(col("doc_id"), size(col("sh")).as("sz"))
    val ex = d.select(block :+ col("doc_id") :+
      explode(col("sh")).as("shingle"): _*)
    val a = ex.select(block :+ col("doc_id").as("a") :+ col("shingle"): _*)
    val b = ex.select(block :+ col("doc_id").as("b") :+ col("shingle"): _*)
    a.join(b, blockCols :+ "shingle")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sz_a")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("sz_b")), "b")
      .select(col("a"), col("b"),
        (floor((col("inter").cast("double") /
          least(col("sz_a"), col("sz_b"))) * 1e6 + 0.5) / 1e6).as("containment"))
      .orderBy(col("containment").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Incremental cross-batch near-dup: probe a NEW batch of documents
    * against an EXISTING corpus without ever pairing the corpus with
    * itself. The corpus contributes only its [[bandIndex]] and shingle
    * sets (both computed once per corpus generation and persisted in
    * production — the index bucketed by band hash, so the probe join
    * shuffles ONLY the batch); candidates are batch∧corpus band-bucket
    * matches, so per-ingest cost scales with the batch size and its
    * bucket fan-out — never |corpus|² and never a corpus-sized broadcast.
    *
    * Output, one row per batch document: its best corpus match (highest
    * verified Jaccard ≥ threshold, ties → lowest corpus id) or
    * `is_new = true` for admission to the corpus. Unmatched rows carry
    * sentinel −1/−1.0 instead of nulls so downstream filters and
    * cross-engine compares never meet a null double.
    */
  def incrementalNearDups(corpus: DataFrame, batch: DataFrame, n: Int = 3,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    incrementalNearDupsFromShingles(
      shingleFrame(corpus, n, textCol, idCol),
      shingleFrame(batch, n, textCol, idCol), k, bands, threshold)

  /** The `(doc_id, shingles)` projection every LSH operator consumes. */
  def shingleFrame(docs: DataFrame, n: Int = 3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextFns.textShingles(col(textCol), n).as("shingles"))

  /** [[incrementalNearDups]] over precomputed shingle frames — the form
    * the streaming admission loop uses so the corpus side is shingled
    * once, not once per micro-batch.
    */
  def incrementalNearDupsFromShingles(cSh: DataFrame, bSh: DataFrame,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val cands = bandIndex(bSh, k, bands)
      .select(col("doc_id").as("b"), col("band_id"), col("band_hash"))
      .join(bandIndex(cSh, k, bands)
        .select(col("doc_id").as("a"), col("band_id"), col("band_hash")),
        Seq("band_id", "band_hash"))
      .select(col("a"), col("b")).distinct()
    val matched = jaccardVerifyCross(cands, cSh, bSh)
      .filter(col("jaccard") >= threshold)
      .groupBy(col("b"))
      // min_by over (−jaccard, a): highest jaccard wins, ties → lowest
      // corpus id; only the double score is negated (see bestSurvivors).
      .agg(min_by(struct(col("a"), col("jaccard")),
        struct((-col("jaccard")).as("neg_j"), col("a"))).as("_best"))
      .select(col("b").as("doc_id"), col("_best.a").as("match_id"),
        col("_best.jaccard").as("match_jaccard"))
    bSh.select(col("doc_id"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_id").isNull.as("is_new"),
        coalesce(col("match_id"), lit(-1L)).as("match_id"),
        coalesce(col("match_jaccard"), lit(-1.0)).as("match_jaccard"))
  }

  /** Continuous corpus admission: the streaming deployment shape of
    * [[incrementalNearDups]]. Each micro-batch is probed against the
    * current corpus index inside `foreachBatch` (the standard
    * stream-to-slowly-growing-table pattern — the probe itself is the
    * batch operator, so plans and semantics are identical to the audited
    * batch path), the per-doc verdicts go to `sink`, and docs admitted as
    * new JOIN the corpus for every subsequent batch — a near-dup of a
    * doc admitted two batches ago is caught. The corpus is held as its
    * shingle frame, checkpointed per batch so lineage never grows with
    * stream length; only the (small) admitted slice of each batch is
    * appended. Call `.start()` on the returned writer.
    */
  def admissionStream(corpus: DataFrame, batchStream: DataFrame, n: Int = 3,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id")
      (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var cSh = shingleFrame(corpus, n, textCol, idCol).materialized
    batchStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val bSh = shingleFrame(batch, n, textCol, idCol).materialized
      val verdicts = incrementalNearDupsFromShingles(cSh, bSh, k, bands, threshold)
        .materialized
      sink(verdicts, batchId)
      val admitted = verdicts.filter(col("is_new")).select(col("doc_id"))
      cSh = cSh.unionByName(bSh.join(admitted, "doc_id")).materialized
    }
  }

  /** SimHash fingerprint: 16 bits, one per md5-hex nibble position — each
    * token votes ±1 per position by that nibble's high bit; the sign of
    * the vote sum is the fingerprint bit. Near-dup docs agree on most bits.
    * Emitted as a 16-char '0'/'1' string (cross-engine-safe).
    *
    * Fully narrow: one native expression per doc (no explode, no shuffle;
    * the exploded+grouped forms benched 5-10× slower, and the HOF fold
    * this replaces was interpreted — see PLANS.md). Docs with no tokens
    * emit no row (null fingerprint filtered), matching the oracle.
    */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        graft.functions.expressions.SimhashExpr.simhashNative(
          TextFns.textShingles(col(textCol), 1)).as("simhash16"))
      .filter(col("simhash16").isNotNull)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance operators a training-data release pipeline runs before
  * publishing a table: a declarative data-quality expectations suite, a
  * referential-integrity audit, a k-anonymity / l-diversity re-identification
  * report, and a seeded pseudo-noise (Laplace-shaped) count release for
  * replayable masking tests.
  *
  * These complete the curation surface (gate → dedup → select → pack) with
  * the *publish* step: the checks a dataset must pass and the privacy report
  * it ships with. Reference analog: the catalog point-update / error-alert
  * path (`data_downloader.py:169,194`) is the reference's only data-quality
  * reaction; this is the systematic form.
  *
  * Scale shapes (100 TB posture):
  *  - [[expectations]] evaluates EVERY check in ONE aggregation pass over the
  *    table (all checks become columns of a single `agg`, partial-aggregable;
  *    the per-check unpivot happens on the one-row result) — adding a check
  *    never adds a scan.
  *  - [[referentialAudit]] is one left-anti join per relationship (shuffle on
  *    the key, AQE-skew-safe), reduced to a one-row count before the union —
  *    the driver never sees rows, only per-relationship totals.
  *  - [[kAnonymityReport]] is two chained aggregations (rows → equivalence
  *    classes → class-size histogram); the output is bounded by the number of
  *    DISTINCT class sizes, never by table or class count.
  *  - [[seededNoisyCounts]] adds hash-seeded Laplace-shaped noise per group
  *    on the already-aggregated counts — noise cost is O(groups), and the
  *    seeded generator (md5 → uniform → inverse-CDF) makes the release
  *    replayable by an independent engine. NOT differential privacy: the
  *    noise is a public function of (group key, seed), so anyone holding the
  *    seed can subtract it; see the method doc.
  */
object Governance {

  // ---------------------------------------------------------------- checks

  /** One declarative data-quality expectation. `metric` semantics per type:
    * violation/null rate in [0,1] (pass = metric <= threshold) or a count
    * floor (pass = metric >= threshold).
    */
  sealed trait Check {
    def name: String
    def column: String
    /** (metricAgg, threshold, passIsAtMost) */
    private[operators] def plan: (Column, Double, Boolean)
  }

  /** Null share of `column` must be <= `maxNullRate`. */
  final case class NotNull(column: String, maxNullRate: Double = 0.0)
      extends Check {
    val name = "not_null"
    private[operators] def plan =
      (avg(when(col(column).isNull, 1.0).otherwise(0.0)), maxNullRate, true)
  }

  /** Share of non-null values outside [lo, hi] must be <= `maxViolRate`. */
  final case class InRange(column: String, lo: Double, hi: Double,
      maxViolRate: Double = 0.0) extends Check {
    val name = "in_range"
    private[operators] def plan =
      (avg(when(col(column).isNotNull &&
        (col(column) < lo || col(column) > hi), 1.0).otherwise(0.0)),
        maxViolRate, true)
  }

  /** Share of non-null values outside `allowed` must be <= `maxViolRate`. */
  final case class InSet(column: String, allowed: Seq[String],
      maxViolRate: Double = 0.0) extends Check {
    val name = "in_set"
    private[operators] def plan =
      (avg(when(col(column).isNotNull &&
        !col(column).isin(allowed: _*), 1.0).otherwise(0.0)),
        maxViolRate, true)
  }

  /** `columns` form a unique key: duplicate-row share must be 0. The metric
    * is 1 − ndv/rows (duplicate share), threshold 0.
    */
  final case class UniqueKey(columns: Seq[String]) extends Check {
    val name = "unique_key"
    val column: String = columns.mkString("+")
    // try_divide: ANSI mode errors on 0/0 for an empty input, where the
    // metric should be null (the gate then fails explicitly on n=0)
    private[operators] def plan =
      (lit(1.0) - try_divide(countDistinct(struct(columns.map(col): _*))
        .cast("double"), count(lit(1)).cast("double")), 0.0, true)
  }

  /** Distinct non-null values of `column` must be >= `atLeast`. */
  final case class MinNdv(column: String, atLeast: Long) extends Check {
    val name = "min_ndv"
    private[operators] def plan =
      (countDistinct(col(column)).cast("double"), atLeast.toDouble, false)
  }

  /** Evaluate all `checks` in one scan.
    *
    * The pass verdict is computed on the UNROUNDED aggregate (at billions of
    * rows a violation rate below 5e-7 would round to 0.0 and sneak past a
    * zero threshold — the exact failure a DQ gate exists to catch); only the
    * reported `metric` column is rounded to 6 for display/replay. An empty
    * input — exactly when a publish gate should fire — yields explicit
    * `pass = false` rows (metrics null), never null verdicts.
    *
    * @return (check, column, metric, threshold, pass) one row per check,
    *         ordered by (check, column); metric rounded to 6.
    */
  def expectations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).as("__n") +: checks.zipWithIndex.map {
      case (c, i) => c.plan._1.as(s"m_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val (_, threshold, atMost) = c.plan
      val metric = col(s"m_$i")
      val rawPass = if (atMost) metric <= threshold else metric >= threshold
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        (floor((metric) * 1e6 + 0.5) / 1e6).as("metric"), lit(threshold).as("threshold"),
        when(col("__n") === 0, lit(false))
          .otherwise(coalesce(rawPass, lit(false))).as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
      .orderBy("check", "column")
  }

  // ----------------------------------------------------- referential audit

  /** One foreign-key relationship to audit: rows of `child` whose `fk` has
    * no match in `parent.pk` are orphans. Null fks count as orphans (a null
    * fk never joins), surfacing them rather than silently passing.
    */
  final case class FkRel(relation: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String)

  /** @return (relation, n_child, n_orphans, orphan_rate) one row per
    *         relationship, ordered by relation.
    */
  def referentialAudit(rels: Seq[FkRel]): DataFrame = {
    require(rels.nonEmpty, "need at least one relationship")
    val perRel = rels.map { r =>
      val total = r.child.agg(count(lit(1)).as("n_child"))
      // parent pk projected under a unique alias: when fk and pk share a
      // name (user_id->user_id, self-referencing tables) an unqualified
      // col(pk) is ambiguous across both join sides
      val orphans = r.child
        .join(r.parent.select(col(r.pk).as("__graft_pk")),
          r.child(r.fk) === col("__graft_pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      total.crossJoin(orphans)
        .select(lit(r.relation).as("relation"), col("n_child"),
          col("n_orphans"),
          (floor((try_divide(col("n_orphans").cast("double"),
            col("n_child").cast("double"))) * 1e6 + 0.5) / 1e6).as("orphan_rate"))
    }
    perRel.reduce(_.union(_)).orderBy("relation")
  }

  // -------------------------------------------------- k-anonymity report

  /** k-anonymity / l-diversity re-identification report: group rows into
    * equivalence classes on the quasi-identifier columns, then histogram the
    * class sizes. A class smaller than `k` is re-identifiable ("at risk");
    * its l-diversity (distinct sensitive values) says what an attacker
    * learns once they pin the class.
    *
    * @return (class_size, n_classes, n_rows, min_l_diversity, at_risk)
    *         ordered by class_size.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[Column],
      sensitive: Column, k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val classes = df
      .groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_diversity"))
    classes
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        (col("class_size") * count(lit(1))).as("n_rows"),
        min(col("l_diversity")).as("min_l_diversity"))
      .withColumn("at_risk", col("class_size") < k)
      .orderBy("class_size")
  }

  // ------------------------------------------------------- noisy release

  /** Hash-seeded uniform in (0,1): (h + 0.5) / 2^32 from the first 8 md5
    * hex digits of "lap|seed|key" — never exactly 0/0.5/1, so the Laplace
    * inverse CDF below is total.
    */
  private def seededUniform(key: Column, seed: Long): Column =
    (conv(substring(md5(concat(lit(s"lap|$seed|"), key)), 1, 8), 16, 10)
      .cast("double") + 0.5) / pow(lit(2.0), 32)

  /** Seeded pseudo-noise count release: per-group counts + Laplace(1/ε)-
    * SHAPED noise via the inverse CDF over a hash-seeded uniform, clamped at
    * 0 and rounded to integers. Deterministic by construction so an
    * independent engine (the DuckDB oracle) can replay the release
    * bit-for-bit — the point is testable masking plumbing, not privacy.
    *
    * This is NOT ε-differential privacy: the noise is a pure public function
    * of (group key, seed), so anyone holding the seed recomputes and
    * subtracts it, recovering exact counts. A real DP release draws the
    * noise from secret PRNG state (committed seeds are published only as
    * hash commitments); swap [[seededUniform]] for a secret-seeded draw and
    * keep everything downstream to get one.
    *
    * @return (group, noisy_count) one row per group, ordered by group.
    */
  def seededNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      seed: Long): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val u = seededUniform(col(groupCol).cast("string"), seed)
    val centered = u - 0.5
    val noise = -(lit(1.0) / epsilon) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col(groupCol),
        greatest(lit(0L), (floor((col("cnt") + noise) * 1e0 + 0.5) / 1e0).cast("long"))
          .as("noisy_count"))
      .orderBy(groupCol)
  }
}

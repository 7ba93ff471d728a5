package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Error side-outputs (reference E1/E2/E4, SURVEY.md §2.1).
  *
  * E1 — catalog point-update: the reference rewrites the whole catalog CSV
  * flipping `Active:=2` for the failed source (`data_downloader.py:40-48`;
  * its bug of writing to a hardcoded side path is not reproduced — we write
  * back to the catalog, SURVEY.md §7.0). Spark form: read → conditional
  * projection → overwrite. The catalog is broadcast-sized, so the "merge"
  * is a map-only projection, no shuffle.
  *
  * E2 — alert records: sanitized reason (`"`→`'`, `data_downloader.py:52`)
  * in a *well-formed* JSON payload (the reference emits malformed JSON,
  * `data_downloader.py:53` — corrected, SURVEY.md §7.0).
  *
  * E4 — retry/dead-letter: redeliver up to `maxAttempts`, then DLQ
  * (`cloudformation/lambda.cfn.yaml:28-36`).
  */
object ErrorPath {

  /** E1: flip `active := 2` for every id in `failedIds` (a small set —
    * point updates come from the error path, never data-scale).
    */
  def flagBroken(catalog: DataFrame, failedIds: Seq[String]): DataFrame =
    catalog.withColumn("active",
      when(col("id").isInCollection(failedIds), lit(2)).otherwise(col("active")))

  /** E1, join form: `failed` is a DataFrame of (id) — broadcast it, the
    * catalog update must not shuffle the catalog.
    */
  def flagBroken(catalog: DataFrame, failed: DataFrame): DataFrame =
    catalog.join(broadcast(failed.select(col("id").as("_fid")).distinct()),
        col("id") === col("_fid"), "left")
      .withColumn("active", when(col("_fid").isNotNull, lit(2)).otherwise(col("active")))
      .drop("_fid")

  /** E2: alert payload per error row (expects ID, URL, REASON columns). */
  val alertMessage =
    "The URL in the source file should has been labelled as Active: 2"

  def alerts(errors: DataFrame): DataFrame =
    errors.select(
      col("ID"), col("URL"),
      translate(col("REASON"), "\"", "'").as("REASON"),
      lit(alertMessage).as("MESSAGE"))

  def alertJson(errors: DataFrame): DataFrame =
    alerts(errors).withColumn("alert_json",
      to_json(struct(col("ID"), col("URL"), col("REASON"), col("MESSAGE"))))

  /** E4: split tasks into retryable (attempts < max) and dead-lettered. */
  def splitRetryable(tasks: DataFrame, maxAttempts: Int = 5): (DataFrame, DataFrame) = {
    val retry = tasks.filter(col("attempts") < maxAttempts)
      .withColumn("attempts", col("attempts") + 1)
    val dead = tasks.filter(col("attempts") >= maxAttempts)
    (retry, dead)
  }

  /** E1+E2+E3 as ONE logical action. The reference executes flag the
    * catalog, publish the alert, ack as three INDEPENDENT writes
    * (`data_downloader.py:40-58`), so a crash between them leaves a
    * flagged catalog with no alert row (or an alert with no flag) —
    * committed through [[graft.sinks.Catalog.transact]] they become a
    * single root publish: a catalog reader observes all three effects
    * or none.
    *
    * Member tables: `catalog` (flagged in place when present — seed it
    * with the source catalog first), `alerts`, `acks` (both read ∪
    * delta snapshot members: rewrite cost per commit is ALERT-scale,
    * never data-scale; drain/archive them periodically like any DLQ).
    * `errors` needs (ID, URL, REASON); `acks` any task-identifying rows.
    */
  def failAtomically(spark: org.apache.spark.sql.SparkSession,
      txnRoot: String, errors: DataFrame,
      acks: DataFrame): graft.sinks.Catalog.RootCommit =
    graft.sinks.Catalog.transact(spark, txnRoot, tag = "errorpath") { txn =>
      txn.read("catalog").foreach { cat =>
        txn.put("catalog", flagBroken(cat, errors.select(col("ID").as("id"))))
      }
      val fresh = alerts(errors)
      txn.put("alerts", txn.read("alerts")
        .map(_.unionByName(fresh)).getOrElse(fresh))
      txn.put("acks", txn.read("acks")
        .map(_.unionByName(acks)).getOrElse(acks))
    }
}

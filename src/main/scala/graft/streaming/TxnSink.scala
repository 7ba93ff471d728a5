package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.sinks.Generations

/** Exactly-once micro-batch parquet sink for `foreachBatch`.
  *
  * Structured Streaming's foreachBatch contract is at-least-once: after a
  * crash between the user write and the checkpoint commit, the SAME
  * batchId is re-delivered, and a plain `df.write.mode("append")` then
  * duplicates the batch — the classic object-store streaming-sink bug.
  * Committing each batch as a [[Generations]] log delta under the tag
  * `batch=<id>` makes the replay a durable no-op: the pointer commit for
  * that batchId already exists, so the second delivery writes nothing
  * visible. End-to-end exactly-once with nothing but the checkpoint and
  * the commit log — no transactional filesystem required, and every
  * object written is immutable (S3-class safe, same argument as
  * [[Generations]]).
  *
  * Read the table with `Generations.readLog`; bound the commit count with
  * periodic `Generations.squash` (the Delta-checkpoint analog).
  */
object TxnSink {

  /** The foreachBatch body: `.foreachBatch(TxnSink.parquetLog(table))`. */
  def parquetLog(table: String): (DataFrame, Long) => Unit =
    (df, batchId) => {
      Generations.appendCommitted(df.sparkSession, df, table,
        s"batch=$batchId")
      ()
    }

  /** [[parquetLog]] + a maintained aggregate view in the same
    * foreachBatch body: each micro-batch lands exactly-once in the
    * append-only source, then [[ChangeFeed.maintainAggOnceLog]] advances
    * the view from exactly the unapplied delta commits (no diff, no
    * history re-scan). Both halves are independently replay-safe — the
    * append by its `batch=<id>` witness, the view by its `=cdcv=<v>` tag
    * — so ANY crash/replay interleaving converges: a replay after both
    * committed is two no-ops; a crash between them leaves the view one
    * tick behind, and the next delivery (or a manual
    * `maintainAggOnceLog` call) catches it up. The view lags the source
    * by at most one in-flight batch, never diverges.
    */
  def parquetLogMaintained(source: String, mvTable: String,
      mvKeys: Seq[String], sumCols: Map[String, String], countCol: String,
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty)
      (aggOf: DataFrame => DataFrame): (DataFrame, Long) => Unit =
    (df, batchId) => {
      Generations.appendCommitted(df.sparkSession, df, source,
        s"batch=$batchId")
      ChangeFeed.maintainAggOnceLog(df.sparkSession, source, mvTable,
        mvKeys, sumCols, countCol, minCols, maxCols)(aggOf)
      ()
    }
}

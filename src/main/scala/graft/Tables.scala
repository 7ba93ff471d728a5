package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Driver-table loaders. The `events.ts` column has drifted across writer
  * versions — TIMESTAMP(NANOS) (read as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`, set in Verify/Bench/test
  * sessions), TIMESTAMP_MICROS(isAdjustedToUTC=false) (read as
  * TIMESTAMP_NTZ by Spark 4), and plain TIMESTAMP — so the loader
  * normalizes all three to session-TZ TIMESTAMP here, in one place. The
  * nanos long is truncated to micros with integral `div` (a double
  * division would lose precision on ns epochs ~1.7e18); the NTZ cast is
  * an identity wall-clock reinterpretation under the UTC session TZ.
  * Oracles mirror this with `CAST(ts AS TIMESTAMP)`.
  */
object Tables {

  val nanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize a `ts` column of any of the three observed encodings to
    * session-TZ TIMESTAMP. Safe to call on already-normalized frames.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName,
          expr(s"timestamp_micros($colName div 1000)"))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
}

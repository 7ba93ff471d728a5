package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Driver-table loaders. The `events` table stores TIMESTAMP(NANOS), which
  * Spark 4 only reads via `spark.sql.legacy.parquet.nanosAsLong` (set in
  * Verify/Bench/test sessions); the long is truncated to microseconds here
  * with integral `div` (a double division would lose precision on ns
  * epochs ~1.7e18). Oracles mirror this with `CAST(ts AS TIMESTAMP)`.
  */
object Tables {

  val nanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}

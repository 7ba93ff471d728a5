package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of driver-contract query registrations. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.operators.Harvest
import graft.sources.{Catalog, Queue}

/** End-to-end harvest job (reference `data_harvester.handler`, SURVEY.md
  * §3.1): catalog → filter/expand/project → enqueue task JSON. One narrow
  * batch stage; the queue dir is the durable harvest→download handoff.
  */
object HarvestJob {

  def run(spark: SparkSession, catalogPath: String, runTs: Timestamp,
      interval: String, queueDir: String): Long = {
    val tasks = Harvest.tasks(Catalog.read(spark, catalogPath), runTs, interval)
    Queue.enqueue(tasks, queueDir)
    spark.read.json(queueDir).count()
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Learn

/** Model deployment to a stream: a Naive Bayes model trained in batch is
  * compiled to a narrow column expression and applied per arriving
  * document — no join, no state, append mode — with routing on the
  * score (the streaming quality-gate shape).
  */
class StreamScoringSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha alpha common filler", 1),
    (2L, "alpha common words here", 1),
    (3L, "more alpha text common", 1),
    (4L, "omega common filler", 0),
    (5L, "omega omega words here", 0),
    (6L, "text with omega common", 0)
  ).toDF("doc_id", "text", "y")

  test("streamed scores reproduce batch NB predictions and route on them") {
    implicit val sqlCtx = spark.sqlContext
    val dims = 32
    val model = Learn.trainNaiveBayes(corpus, col("y") === 1, dims)
    val (w, prior) = Learn.nbModelArrays(model, dims)
    val scoreCol = Learn.nbScoreColumn(w, prior, dims, col("text"))

    val batchPreds = Learn.predictNaiveBayes(corpus, model, col("y") === 1, dims)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pred")).toMap

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .withColumn("score", round(scoreCol, 6))
      .withColumn("route",
        when(col("score") >= 0, lit("keep")).otherwise(lit("reject")))
      .writeStream.format("memory").queryName("scored")
      .outputMode(OutputMode.Append).start()
    corpus.collect().foreach(r => input.addData(r.getLong(0) -> r.getString(1)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("scored").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("doc_id"), r.getAs[String]("route")))).toMap
    assert(streamed.size == 6)
    streamed.values.foreach { case (id, route) =>
      val want = if (batchPreds(id) == 1L) "keep" else "reject"
      assert(route == want, s"doc $id routed $route, batch pred says $want")
    }
    // the stream plan is narrow: no aggregation state was needed
    assert(spark.table("scored").columns.toSet ==
      Set("doc_id", "text", "score", "route"))
  }
}

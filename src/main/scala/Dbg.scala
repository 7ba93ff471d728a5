import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(sys.env.getOrElse("DBG_SF", "/root/testdata/sf0.01") + "/embeddings.parquet")
    println("N = " + emb.count())
    val nCells = 16
    val centroid = udaf(graft.functions.CentroidAgg)

    def assignTo(cents: DataFrame): DataFrame =
      emb.crossJoin(broadcast(cents))
        .withColumn("sim", round(VectorFns.cosine(col("embedding"), col("c_emb")), 6))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("embedding"), col("cell")),
          struct((-col("sim")).as("ns"), col("cell"))).as("b"))
        .select(col("vec_id"), col("b.embedding").as("embedding"), col("b.cell").as("cell"))

    def lloyd(iters: Int): DataFrame = {
      var cents = emb.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      for (_ <- 1 to iters) {
        cents = assignTo(cents).groupBy(col("cell"))
          .agg(centroid(col("embedding")).as("c0"))
          .select(col("cell"), transform(col("c0"), x => round(x, 6)).as("c_emb"))
          .localCheckpoint()
      }
      cents
    }

    def recall(cents: DataFrame, nProbe: Int): Double = {
      val cells = assignTo(cents).withColumn("nrm", VectorFns.norm(col("embedding"))).localCheckpoint()
      val q = cells.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val probeRank = cents.crossJoin(broadcast(q))
        .withColumn("q_sim", round(VectorFns.cosine(col("c_emb"), col("q_emb")), 6))
        .select(col("q_id").as("pr_q"), col("cell").as("pr_cell"),
          row_number().over(Window.partitionBy(col("q_id")).orderBy(col("q_sim").desc, col("cell"))).as("cell_rank"))
      val pairs = cells.select(col("vec_id").as("c_id"), col("embedding").as("c_emb2"),
          col("nrm").as("c_nrm"), col("cell").as("c_cell"))
        .crossJoin(broadcast(q)).filter(col("c_id") =!= col("q_id"))
        .withColumn("cos", round(VectorFns.dot(col("q_emb"), col("c_emb2")) / (col("q_nrm") * col("c_nrm")), 6))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
      val exact = pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        .select(col("q_id"), col("c_id"))
      val probed = pairs.join(probeRank, col("q_id") === col("pr_q") && col("c_cell") === col("pr_cell"))
        .filter(col("cell_rank") <= nProbe)
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        .select(col("q_id"), col("c_id"))
      val hits = exact.join(probed, Seq("q_id", "c_id")).count()
      hits.toDouble / exact.count()
    }

    for (it <- Seq(2)) {
      val c = lloyd(it)
      val r = Seq(4, 5, 6, 8).map(np => f"${recall(c, np)}%.3f").mkString("/")
      println(s"RES sf=" + sys.env.getOrElse("DBG_SF", "?") + s" iters=$it recall@10 nProbe4/5/6/8 = $r")
    }
    spark.stop()
  }
}

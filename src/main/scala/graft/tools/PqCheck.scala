package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqCheck {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.functions.install(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") >= 200 && col("vec_id") < 210)
    for ((m, ksub, rr) <- Seq((16, 16, 0), (16, 16, 50), (16, 16, 100), (8, 16, 100))) {
      val cb = graft.ops.Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = m, ksub = ksub)
      val pq = graft.ops.Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        k = 10, m = m, ksub = ksub, codebooks = Some(cb), roundScoreTo = 4, rerank = rr)
      val bf = graft.ops.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      val hits = pq.join(bf.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
      val rows = hits.collect().map(r => r.getLong(1)).sorted
      println(s"m=$m ksub=$ksub rerank=$rr per-query hits: ${rows.mkString(",")} total=${rows.sum}")
    }
    spark.stop()
  }
}

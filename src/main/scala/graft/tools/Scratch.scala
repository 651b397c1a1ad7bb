package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").config("spark.sql.shuffle.partitions","4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 2f, 3f, 4f, 1f, 2f, 3f, 4f)),
      (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array.empty[Float]),
      (3L, Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (4L, Array(1f, 2f))  // short
    ).toDF("vec_id", "embedding")
    def tryOp(name: String)(f: => Long): Unit =
      try println(s"OK $name -> " + f)
      catch { case e: Throwable => println(s"FAIL $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(150)}") }
    tryOp("bruteforce")(Similarity.bruteForceTopK(vecs, nQueries = 1, k = 3).count())
    tryOp("lsh")(Similarity.lshTopK(vecs, nQueries = 1, k = 3).count())
    tryOp("multiprobe")(Similarity.lshMultiProbeTopK(vecs, nQueries = 1, k = 3).count())
    tryOp("ivf")(Similarity.ivfTopK(vecs, nQueries = 1, k = 3).count())
    tryOp("bucketStats")(Similarity.bucketStats(vecs).count())
    tryOp("normStats")(Similarity.normStats(vecs).count())
    tryOp("embDedup")(Dedup.embeddingNearDup(vecs).count())
    spark.stop()
  }
}

package graft
object Scratch {
  def main(a: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (k <- Seq("text_minhash_lsh", "text_near_dup_jaccard", "vec_neardup_blocked")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(k)(s, "/root/testdata/sf0.1").count()
      println(f"$k: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    }
    s.stop()
  }
}

package graft
object Scratch {
  def main(a: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (k <- Seq("filter_date_range", "join_multiway", "join_shuffle_inner", "agg_groupby_hash", "limit_topk")) {
      println(s"========== $k ==========")
      val plan = SparkEntry.queries(k)(s, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // print compactly: node list + pushed filters lines
      plan.linesIterator.foreach { l =>
        if (l.matches("^\\(\\d+\\).*") || l.contains("PushedFilters") || l.contains("ReadSchema") || l.contains("DataFilters"))
          println(l.take(200))
      }
    }
    s.stop()
  }
}

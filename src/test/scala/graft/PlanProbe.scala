package graft

import org.apache.spark.sql.execution.ExplainMode

/** Ad-hoc plan dumper for iterating on PlanSuite pins:
  * `sbt "Test/runMain graft.PlanProbe <key> [sfDir]"`.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else TestSpark.sf0001
    println(SparkEntry.queries(key)(TestSpark.spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted")))
    TestSpark.spark.stop()
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-name registration for Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, spark-catalyst).
  * They power the optimizer's automatic runtime row-level filtering but
  * are not exposed in the public function registry; graft registers them
  * so `join_bloom_prefilter` can spell the prefilter pattern explicitly.
  * No custom code runs here — both expressions are stock Spark (codegen,
  * partial-merge, the works).
  */
object Bloom {
  /** Register `bloom_filter_agg(hash, estItems, numBits)` and
    * `might_contain(bloomBinary, hash)` (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator of the SURVEY.md §2 inventory: the Spark implementation and
  * its DuckDB oracle SQL co-located as a single source of truth per key.
  * `oracle = None` marks the non-oracle ops (checked by ScalaTest
  * equivalence instead).
  */
final case class Op(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait OpGroup {
  def ops: Seq[Op]
}

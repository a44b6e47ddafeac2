package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-group operator inventories of SURVEY.md §2.
  */
object SparkEntry {
  private val groups: Seq[OpGroup] = Seq(
    SourceOps,
    FilterOps,
    JoinOps,
    AggOps,
    WindowOps,
    ScalarOps,
    SortSetOps,
    EtlOps,
    TextVecOps,
    PipelineOps,
    EventOps,
    StreamOps)

  val all: Seq[Op] = groups.flatMap(_.ops)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_groupby_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Insertion-ordered
    * (ListMap) so Bench iteration is deterministic — a hash-ordered Map put
    * the ~3 s JVM/codegen warm-up on an arbitrary key each run.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(all.map(o => o.key -> o.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(all.flatMap(o => o.oracle.map(o.key -> _)): _*)
}

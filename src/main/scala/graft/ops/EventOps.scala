package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Group I — event-time / streaming-shaped batch ops (SURVEY.md §2.1 I).
  * All use the §1.4 ns→µs recipe via [[graft.Tables.events]]; the DuckDB
  * side reads ts natively as TIMESTAMP_NS and truncates with
  * `CAST(ts AS TIMESTAMP)`.
  */
object EventOps extends OpGroup {
  import graft.Tables.dec2

  val ops: Seq[Op] = Seq(
    Op("ts_tumbling",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast(DecimalType(18, 2)).as("sum_value"))
          .select(col("window.start").as("window_start"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy("window_start", "event_type")
      },
      Some("""
        SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
          event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
      """.stripMargin.trim))
  )
}

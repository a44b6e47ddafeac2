package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Group D — aggregations (SURVEY.md §2.1 D).
  *
  * Scale notes: every op here is a two-phase HashAggregate (map-side
  * partial + final), so the shuffle carries only group keys × partial
  * buffers — cardinality-bounded, not data-bounded. Decimal sums keep
  * results exact and order-insensitive across any partitioning.
  */
object AggOps extends OpGroup {
  import graft.Tables.dec2

  private val d = (x: Double) => lit(BigDecimal(x).setScale(2)).cast(DecimalType(18, 2))

  val ops: Seq[Op] = Seq(
    // TPC-H Q1-shaped pricing summary — the flagship (SURVEY.md §7.2).
    Op("agg_groupby_hash",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        val price = col("l_extendedprice").cast(DecimalType(12, 2))
        val disc = col("l_discount").cast(DecimalType(4, 2))
        val tax = col("l_tax").cast(DecimalType(4, 2))
        li.filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(dec2(col("l_quantity"))).cast(DecimalType(18, 2)).as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast(DecimalType(18, 2)).as("sum_base_price"),
            sum(price * (lit(BigDecimal(1).setScale(2)).cast(DecimalType(4, 2)) - disc))
              .cast(DecimalType(18, 2)).as("sum_disc_price"),
            sum(price * (lit(BigDecimal(1).setScale(2)).cast(DecimalType(4, 2)) - disc)
                * (lit(BigDecimal(1).setScale(2)).cast(DecimalType(4, 2)) + tax))
              .cast(DecimalType(18, 2)).as("sum_charge"),
            round(sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
            round(sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
            round(sum(dec2(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DECIMAL(18,2)) AS sum_disc_price,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DECIMAL(18,2)) AS sum_charge,
          ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
          ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
          ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim))
  )
}

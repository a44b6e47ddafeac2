package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Groups F + G — sort/limit/top-k and set operations (SURVEY.md §2.1 F,G).
  *
  * Scale notes: `orderBy().limit(k)` plans as TakeOrderedAndProject —
  * per-partition top-k then a driver-side merge of k·partitions rows; no
  * global sort ever materializes. Set ops are hash-partitioned distincts.
  */
object SortSetOps extends OpGroup {

  private def ordersIn(s: org.apache.spark.sql.SparkSession, dir: String, year: Int) =
    Tables.t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(f"$year-01-01").cast("timestamp_ntz")
        && col("o_orderdate") < lit(f"${year + 1}-01-01").cast("timestamp_ntz"))
      .select("o_custkey")

  val ops: Seq[Op] = Seq(
    Op("sort_multikey_nulls",
      (s, dir) => {
        Tables.t(s, dir, "customer")
          .select(
            col("c_custkey"),
            when(col("c_acctbal") > 0, col("c_acctbal").cast(DecimalType(12, 2))).cast("double").as("bal_pos"))
          .orderBy(desc_nulls_last("bal_pos"), asc("c_custkey"))
          .limit(100)
      },
      Some("""
        SELECT c_custkey,
          CAST(CASE WHEN c_acctbal > 0 THEN CAST(c_acctbal AS DECIMAL(12,2)) END AS DOUBLE) AS bal_pos
        FROM customer
        ORDER BY bal_pos DESC NULLS LAST, c_custkey
        LIMIT 100
      """.trim)),

    Op("limit_topk",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
      """.trim)),

    Op("set_union_all",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val a = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), lit("BUILDING").as("seg"))
        val b = c.filter(col("c_mktsegment") === "AUTOMOBILE")
          .select(col("c_custkey"), lit("AUTOMOBILE").as("seg"))
        a.unionAll(b).orderBy("c_custkey", "seg")
      },
      Some("""
        SELECT c_custkey, 'BUILDING' AS seg FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey, 'AUTOMOBILE' AS seg FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        ORDER BY c_custkey, seg
      """.trim)),

    Op("set_union_distinct",
      (s, dir) => ordersIn(s, dir, 1995).union(ordersIn(s, dir, 1996))
        .distinct().orderBy("o_custkey"),
      Some("""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        UNION
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        ORDER BY o_custkey
      """.trim)),

    // Bag (multiset) semantics: duplicates preserved by multiplicity.
    Op("set_except_all",
      (s, dir) => ordersIn(s, dir, 1995).exceptAll(ordersIn(s, dir, 1996))
        .orderBy("o_custkey"),
      Some("""
        (SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01')
        EXCEPT ALL
        (SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        ORDER BY o_custkey
      """.trim)),

    Op("set_intersect_all",
      (s, dir) => ordersIn(s, dir, 1995).intersectAll(ordersIn(s, dir, 1996))
        .orderBy("o_custkey"),
      Some("""
        (SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01')
        INTERSECT ALL
        (SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        ORDER BY o_custkey
      """.trim)),

    Op("set_intersect",
      (s, dir) => ordersIn(s, dir, 1995).intersect(ordersIn(s, dir, 1996))
        .orderBy("o_custkey"),
      Some("""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        ORDER BY o_custkey
      """.trim)),

    Op("set_except",
      (s, dir) => ordersIn(s, dir, 1995).except(ordersIn(s, dir, 1996))
        .orderBy("o_custkey"),
      Some("""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        ORDER BY o_custkey
      """.trim)),

    // Schema-aligning union: frames with differently-ordered and missing
    // columns combine by NAME, absent columns null-filled —
    // unionByName(allowMissingColumns) ≡ DuckDB's UNION ALL BY NAME.
    Op("set_union_byname",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val a = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
        val b = c.filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_mktsegment").as("seg"), col("c_custkey"))   // no bal, reordered
        a.unionByName(b, allowMissingColumns = true)
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS bal
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL BY NAME
        SELECT c_mktsegment AS seg, c_custkey
        FROM customer WHERE c_mktsegment = 'MACHINERY'
        ORDER BY c_custkey
      """.trim))
  )
}

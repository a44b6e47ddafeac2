package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Group B — projection / filter / predicates (SURVEY.md §2.1 B).
  *
  * Scale notes: all predicates here are Catalyst-pushable to the parquet
  * scan (`PushedFilters`), so at 100 TB they become row-group/page skips,
  * not post-scan filters. Projections prune the read schema.
  */
object FilterOps extends OpGroup {

  val ops: Seq[Op] = Seq(
    Op("proj_rename_cast",
      (s, dir) => {
        Tables.t(s, dir, "orders").select(
          col("o_orderkey").cast("string").as("order_id"),
          col("o_custkey").as("cust_id"),
          col("o_totalprice").cast(DecimalType(12, 2)).cast("double").as("total_price"),
          col("o_orderstatus").as("status"))
          .orderBy("order_id")
      },
      Some("""
        SELECT CAST(o_orderkey AS VARCHAR) AS order_id, o_custkey AS cust_id,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
          o_orderstatus AS status
        FROM orders ORDER BY order_id
      """.trim)),

    Op("filter_compound",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .filter((col("l_discount").between(0.02, 0.06) && col("l_quantity") < 25)
            || col("l_returnflag") === "R")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem
        WHERE (l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25)
           OR l_returnflag = 'R'
        GROUP BY l_returnflag ORDER BY l_returnflag
      """.trim)),

    Op("filter_in_like",
      (s, dir) => {
        Tables.t(s, dir, "part")
          .filter(col("p_brand").isin("Brand#1", "Brand#5", "Brand#12")
            && col("p_name").like("%a%")
            && !col("p_size").isin(3, 7))
          .select("p_partkey", "p_name", "p_brand", "p_size")
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey, p_name, p_brand, p_size
        FROM part
        WHERE p_brand IN ('Brand#1','Brand#5','Brand#12')
          AND p_name LIKE '%a%'
          AND p_size NOT IN (3, 7)
        ORDER BY p_partkey
      """.trim)),

    // Three-valued logic: NULLIF-derived nullable column compared with both
    // plain `=` (nullable result) and null-safe `<=>`.
    Op("filter_null_safe",
      (s, dir) => {
        Tables.t(s, dir, "orders")
          .withColumn("st", expr("nullif(o_orderstatus, 'P')"))
          .groupBy(
            (col("st") <=> lit("F")).as("is_f_nullsafe"),
            (col("st") === lit("F")).as("is_f_plain"))
          .agg(count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("is_f_nullsafe"), asc_nulls_first("is_f_plain"))
      },
      Some("""
        SELECT (NULLIF(o_orderstatus,'P') IS NOT DISTINCT FROM 'F') AS is_f_nullsafe,
          (NULLIF(o_orderstatus,'P') = 'F') AS is_f_plain, COUNT(*) AS n
        FROM orders GROUP BY 1, 2
        ORDER BY is_f_nullsafe NULLS FIRST, is_f_plain NULLS FIRST
      """.trim)),

    // Scalar subquery: customers above the global mean balance. The mean
    // is one broadcast row (the decorrelated plan Catalyst would build);
    // decimal-sum/COUNT division keeps the threshold deterministic.
    Op("sub_scalar",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val avg = c.agg(
          (sum(Tables.dec2(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
        c.crossJoin(broadcast(avg))
          .filter(col("c_acctbal") > col("avg_bal"))
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer)
        ORDER BY c_custkey
      """.trim)),

    // Correlated subquery, window-decorrelated: orders 1.5× above their
    // own customer's average order value. Both sides use the same window
    // formulation so the per-customer mean is arithmetically identical.
    Op("sub_correlated",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
        Tables.t(s, dir, "orders")
          .withColumn("cust_avg",
            sum(Tables.dec2(col("o_totalprice"))).over(w).cast("double")
              / count(lit(1)).over(w))
          .filter(col("o_totalprice") > col("cust_avg") * 1.5)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
              / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
          FROM orders
        ) WHERE o_totalprice > cust_avg * 1.5
        ORDER BY o_orderkey
      """.trim)),

    // Deterministic hash-based Bernoulli sampling (~5%): the reproducible
    // alternative to rand()-based sample() (excluded per SURVEY §2.0.6).
    // The md5 bucket of the row key decides membership, so the sample is
    // stable across runs, engines, partitionings, and cluster sizes —
    // exactly what a training-data pipeline needs for repeatable splits.
    // Fully parallel row-local filter: no shuffle, pushes nothing, skips
    // nothing — at 100 TB it's one scan with a cheap residual.
    Op("sample_hash",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .filter(expr("CAST(conv(substring(md5(concat(l_orderkey, '_', l_linenumber)), 1, 15), 16, 10) AS BIGINT) % 100 < 5"))
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE CAST(('0x' || substr(md5(l_orderkey || '_' || l_linenumber), 1, 15)) AS BIGINT) % 100 < 5
        ORDER BY l_orderkey, l_linenumber
      """.trim)),

    // Stratified deterministic sampling: exactly 20 docs per lang, picked
    // by md5-hash order (hash ties broken by doc_id) — the per-stratum
    // quota twin of sample_hash's global Bernoulli. The hash order is a
    // uniform-but-reproducible shuffle, so the quota is an unbiased draw
    // that is stable across runs, engines, and partitionings. One window
    // per stratum; at 100 TB the same plan is a partial per-partition
    // top-k under the window (rank filter pushes the sort down).
    Op("sample_stratified",
      (s, dir) => {
        val w = Window.partitionBy("lang")
          .orderBy(col("hk"), col("doc_id"))
        Tables.t(s, dir, "documents")
          .withColumn("hk", md5(col("doc_id").cast("string")))
          .withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 20)
          .select("doc_id", "lang", "rk")
          .orderBy("lang", "rk")
      },
      Some("""
        SELECT doc_id, lang, rk FROM (
          SELECT doc_id, lang,
            CAST(ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
          FROM documents
        ) WHERE rk <= 20
        ORDER BY lang, rk
      """.trim)),

    // CLASS-BALANCED DOWNSAMPLING — the other rebalancing primitive next
    // to corpus_temperature_sample's soft flattening: hard-cap every
    // class at the MINORITY class's size (the classic balanced-training
    // set; this corpus is genuinely skewed — en has ~3× fr). Selection
    // within a class is the md5-rank coin (stable across runs, engines
    // and partitionings — the reproducible-split requirement), so the
    // kept set is a deterministic function of the data alone. The report
    // is per-class before/after + the verification column that every
    // kept count equals the minority size. Per-class window over the
    // class's slice; the minority size is a 1-row broadcast. At 100 TB
    // the same two passes hold: one count per class, one rank-filter.
    Op("sample_balanced_class",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val minN = d.groupBy("lang").agg(count(lit(1)).as("n"))
          .agg(min("n").as("min_n"))
        val w = Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))
        d.withColumn("hk", md5(col("doc_id").cast("string")))
          .withColumn("rk", row_number().over(w))
          .crossJoin(broadcast(minN))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("rk") <= col("min_n"), 1L).otherwise(0L)).as("n_kept"),
            max("min_n").as("cap"))
          .select(col("lang"), col("n_docs"), col("n_kept"),
            (col("n_kept") === col("cap")).as("balanced"))
          .orderBy("lang")
      },
      Some("""
        WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        cap AS (SELECT MIN(n) AS min_n FROM counts),
        rk AS (
          SELECT lang,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN rk <= cap.min_n THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          (SUM(CASE WHEN rk <= cap.min_n THEN 1 ELSE 0 END) = cap.min_n) AS balanced
        FROM rk, cap GROUP BY lang, cap.min_n ORDER BY lang
      """.trim)),

    Op("filter_date_range",
      (s, dir) => {
        Tables.t(s, dir, "orders")
          .filter(col("o_orderdate").between(
            lit("1996-01-01").cast("timestamp_ntz"),
            lit("1996-12-31").cast("timestamp_ntz")))
          .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
          .agg(
            count(lit(1)).as("n"),
            sum(Tables.dec2(col("o_totalprice"))).cast(DecimalType(18, 2)).cast("double").as("sum_price"))
          .orderBy("month")
      },
      Some("""
        SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        GROUP BY 1 ORDER BY month
      """.trim)),

    // Weighted sampling without replacement — Efraimidis-Spirakis A-ES
    // (2006): each doc draws priority u^(1/w) from a reproducible
    // md5-uniform u and weight w = n_chars, global top-20 by priority.
    // The quality/length-weighted corpus draw every training-mix build
    // runs; A-ES is THE distributed algorithm for it (priority is
    // row-local, selection is a top-k — one partial top-k per partition,
    // no global sort, no sequential pass like reservoir sampling). u is
    // exact-rational (md5Long%1e6 + 0.5)/1e6 so both engines feed pow
    // identical doubles; keys of distinct docs are ~1e-6 apart so the
    // ≤1-ulp libm pow skew can't flip the ranking (doc_id tiebreak
    // regardless). The priority itself is not dumped — ids, weight, rank.
    Op("sample_weighted",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .withColumn("u", (expr(
            "CAST(conv(substring(md5(concat('ws_', doc_id)), 1, 15), 16, 10) AS BIGINT) % 1000000")
            + lit(0.5)) / lit(1000000.0))
          .withColumn("priority", pow(col("u"), lit(1.0) / col("n_chars")))
          .orderBy(desc("priority"), asc("doc_id"))
          .limit(20)
          .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(desc("priority"), asc("doc_id"))))
          .select(col("rk"), col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("rk")
      },
      Some("""
        SELECT rk, doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
            CAST(ROW_NUMBER() OVER (ORDER BY
              pow((CAST(('0x' || substr(md5('ws_' || doc_id), 1, 15)) AS BIGINT) % 1000000 + 0.5) / 1000000.0,
                  1.0 / n_chars) DESC, doc_id) AS INT) AS rk
          FROM documents
        ) WHERE rk <= 20 ORDER BY rk
      """.trim)),

    // Deterministic train/val/test split (80/10/10) by md5-bucket of the
    // document key — the reproducible split a training pipeline needs:
    // stable across runs, engines, partitionings, and INCREMENTAL data
    // (a new doc lands in a split without moving any existing doc, unlike
    // rand() or modulo-of-row-number). Report is the per-split×lang
    // composition audit. Pure map-side bucket + one partial agg.
    Op("sample_split_train_test",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .withColumn("b", expr(
            "CAST(conv(substring(md5(concat('split_', doc_id)), 1, 15), 16, 10) AS BIGINT) % 10"))
          .withColumn("split",
            when(col("b") < 8, "train").when(col("b") === 8, "val").otherwise("test"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars_total"))
          .orderBy("split", "lang")
      },
      Some("""
        SELECT split, lang, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS chars_total
        FROM (
          SELECT lang, n_chars,
            CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
          FROM (
            SELECT lang, n_chars,
              CAST(('0x' || substr(md5('split_' || doc_id), 1, 15)) AS BIGINT) % 10 AS b
            FROM documents))
        GROUP BY 1, 2 ORDER BY 1, 2
      """.trim))
  )
}

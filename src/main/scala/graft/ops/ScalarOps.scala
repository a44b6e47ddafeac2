package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Group H — scalar function families (SURVEY.md §2.1 H). All expressions
  * are built-in Catalyst functions → whole-stage codegen, no UDFs.
  * Cross-dialect pins (verified against DuckDB 1.0): length/size/extract
  * results cast to INT both sides; dow normalized to 0=Sunday; ceil/floor
  * cast to BIGINT; regexp_replace needs the 'g' flag in DuckDB.
  */
object ScalarOps extends OpGroup {

  val ops: Seq[Op] = Seq(
    Op("fn_string",
      (s, dir) => {
        Tables.t(s, dir, "customer").select(
          col("c_custkey"),
          upper(col("c_name")).as("up_name"),
          lower(col("c_mktsegment")).as("lo_seg"),
          length(col("c_name")).cast("int").as("len_name"),
          substring(col("c_name"), 1, 8).as("sub_name"),
          concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat_name"),
          lpad(col("c_mktsegment"), 12, "*").as("pad_seg"),
          expr("replace(c_name, 'Customer', 'Cust')").as("repl_name"),
          trim(concat(lit("  "), col("c_name"), lit(" "))).as("trim_name"),
          size(split(col("c_name"), "#")).cast("int").as("n_parts"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, upper(c_name) AS up_name, lower(c_mktsegment) AS lo_seg,
          CAST(length(c_name) AS INT) AS len_name,
          substring(c_name, 1, 8) AS sub_name,
          c_name || '-' || c_mktsegment AS cat_name,
          lpad(c_mktsegment, 12, '*') AS pad_seg,
          replace(c_name, 'Customer', 'Cust') AS repl_name,
          trim('  ' || c_name || ' ') AS trim_name,
          CAST(len(string_split(c_name, '#')) AS INT) AS n_parts
        FROM customer ORDER BY c_custkey
      """.trim)),

    Op("fn_regexp",
      (s, dir) => {
        Tables.t(s, dir, "part")
          .filter(col("p_name").rlike("a.*e"))
          .select(
            col("p_partkey"),
            regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"),
            regexp_replace(col("p_type"), "\\s+", "_").as("type_u"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
          CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num,
          regexp_replace(p_type, '\s+', '_', 'g') AS type_u
        FROM part
        WHERE regexp_matches(p_name, 'a.*e')
        ORDER BY p_partkey
      """.trim)),

    // dow numbering differs (Spark dayofweek 1=Sun, DuckDB dayofweek 0=Sun)
    // → normalized to 0=Sunday on both sides.
    Op("fn_datetime",
      (s, dir) => {
        Tables.t(s, dir, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("int").as("yr"),
          month(col("o_orderdate")).cast("int").as("mo"),
          dayofmonth(col("o_orderdate")).cast("int").as("dy"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp_ntz"))
            .cast("int").as("days_since_95"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus_30d"),
          (dayofweek(col("o_orderdate")) - 1).cast("int").as("dow0"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
          CAST(year(o_orderdate) AS INT) AS yr,
          CAST(month(o_orderdate) AS INT) AS mo,
          CAST(day(o_orderdate) AS INT) AS dy,
          date_trunc('month', o_orderdate) AS month_start,
          CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95,
          o_orderdate + INTERVAL 30 DAY AS plus_30d,
          CAST(dayofweek(o_orderdate) AS INT) AS dow0
        FROM orders ORDER BY o_orderkey
      """.trim)),

    // Month arithmetic: both engines clamp end-of-month identically
    // (1996-01-31 + 1 month → 1996-02-29); month distance via the explicit
    // boundary formula (DuckDB's date_diff('month') semantics).
    Op("fn_month_arith",
      (s, dir) => {
        Tables.t(s, dir, "orders").select(
          col("o_orderkey"),
          // DATE results cast to TIMESTAMP_NTZ in the dumped frame (SURVEY
          // §2.0 rule 8): a parquet DATE loads as datetime.date objects in
          // pandas while the oracle's fetchdf gives datetime64 — cast to
          // the type both sides agree on.
          add_months(col("o_orderdate"), 1).cast("timestamp_ntz").as("plus_1mo"),
          last_day(col("o_orderdate")).cast("timestamp_ntz").as("month_end"),
          ((year(col("o_orderdate")) - 1995) * 12 + (month(col("o_orderdate")) - 1))
            .cast("int").as("months_since_95"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
          CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS TIMESTAMP) AS plus_1mo,
          CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
          CAST((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1) AS INT) AS months_since_95
        FROM orders ORDER BY o_orderkey
      """.trim)),

    Op("fn_math",
      (s, dir) => {
        Tables.t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
          round(log(col("l_quantity") + 1), 4).as("ln_qty"),
          round(log10(col("l_extendedprice")), 4).as("log10_price"),
          round(pow(col("l_discount"), 2), 6).as("disc_sq"),
          abs(col("l_quantity") - 25).as("abs_dev"),
          ceil(col("l_quantity") / 7).cast("long").as("ceil_q7"),
          floor(col("l_quantity") / 7).cast("long").as("floor_q7"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod7"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
          CAST(ROUND(CAST(CAST(sqrt(l_quantity) AS VARCHAR) AS DECIMAL(38,15)), 4) AS DOUBLE) AS sqrt_qty,
          CAST(ROUND(CAST(CAST(ln(l_quantity + 1) AS VARCHAR) AS DECIMAL(38,15)), 4) AS DOUBLE) AS ln_qty,
          CAST(ROUND(CAST(CAST(log10(l_extendedprice) AS VARCHAR) AS DECIMAL(38,15)), 4) AS DOUBLE) AS log10_price,
          CAST(ROUND(CAST(CAST(pow(l_discount, 2) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS disc_sq,
          abs(l_quantity - 25) AS abs_dev,
          CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q7,
          CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q7,
          l_orderkey % 7 AS key_mod7
        FROM lineitem ORDER BY l_orderkey, l_linenumber
      """.trim)),

    Op("fn_conditional",
      (s, dir) => {
        Tables.t(s, dir, "orders").select(
          col("o_orderkey"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
            .when(col("o_orderpriority") === "3-MEDIUM", "mid")
            .otherwise("low").as("prio_class"),
          coalesce(expr("nullif(o_orderstatus, 'P')"), lit("PENDING")).as("status_filled"),
          greatest(col("o_totalprice"), lit(100000.0)).as("price_floor"),
          least(col("o_totalprice"), lit(300000.0)).as("price_cap"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
          CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
               WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
               ELSE 'low' END AS prio_class,
          COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
          GREATEST(o_totalprice, 100000.0) AS price_floor,
          LEAST(o_totalprice, 300000.0) AS price_cap
        FROM orders ORDER BY o_orderkey
      """.trim)),

    Op("fn_hash",
      (s, dir) => {
        Tables.t(s, dir, "documents").select(
          col("doc_id"),
          md5(col("text")).as("md5_text"),
          sha2(col("text"), 256).as("sha256_text"),
          length(col("text")).cast("int").as("len_text"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, md5(text) AS md5_text, sha256(text) AS sha256_text,
          CAST(length(text) AS INT) AS len_text
        FROM documents ORDER BY doc_id
      """.trim)),

    Op("fn_json",
      (s, dir) => {
        Tables.events(s, dir)
          .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy("k").agg(count(lit(1)).as("n"))
          .orderBy("k")
      },
      Some("""
        SELECT CAST(props->>'$.k' AS INT) AS k, COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY k
      """.trim)),

    Op("fn_array",
      (s, dir) => {
        Tables.t(s, dir, "embeddings").select(
          col("vec_id"),
          size(col("embedding")).cast("int").as("dim"),
          // `+ 0.0`: a tiny negative first element rounds to -0.0 in
          // DuckDB but 0.0 in Spark (rule 8; caught by the sf0.1 sweep).
          (round(element_at(col("embedding"), 1).cast("double"), 4) + 0.0).as("first_val"),
          (round(array_max(col("embedding")).cast("double"), 4) + 0.0).as("max_val"),
          (round(array_min(col("embedding")).cast("double"), 4) + 0.0).as("min_val"),
          size(slice(col("embedding"), 1, 8)).cast("int").as("slice_len"))
          .orderBy("vec_id")
      },
      Some("""
        SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
          CAST(ROUND(CAST(CAST(CAST(embedding[1] AS DOUBLE) AS VARCHAR) AS DECIMAL(38,15)), 4) AS DOUBLE) + 0.0 AS first_val,
          CAST(ROUND(CAST(CAST(CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS VARCHAR) AS DECIMAL(38,15)), 4) AS DOUBLE) + 0.0 AS max_val,
          CAST(ROUND(CAST(CAST(CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS VARCHAR) AS DECIMAL(38,15)), 4) AS DOUBLE) + 0.0 AS min_val,
          CAST(len(list_slice(embedding, 1, 8)) AS INT) AS slice_len
        FROM embeddings ORDER BY vec_id
      """.trim)),

    // The built-in Generator surface (Catalyst `Generate` node): tokenize
    // via explode; at scale this is a map-side flatMap — no shuffle until
    // the count aggregation.
    Op("fn_explode_wordcount",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("word"))
          .limit(20)
      },
      Some("""
        SELECT word, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word ORDER BY n DESC, word LIMIT 20
      """.trim)),

    // Null-preserving generator: explode_outer keeps the parent row (with
    // a NULL element) when the array is empty — the LEFT-JOIN-shaped
    // unnest. Threshold 5 exercises BOTH surfaces on this corpus: some
    // docs fan out to multiple rows, some hit the empty→NULL branch.
    Op("fn_explode_outer",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .withColumn("long_toks",
            expr("filter(array_distinct(split(text, ' ')), t -> length(t) > 5)"))
          .select(col("doc_id"), explode_outer(col("long_toks")).as("tok"))
          .orderBy(asc("doc_id"), asc_nulls_first("tok"))
      },
      Some("""
        SELECT doc_id,
          unnest(CASE WHEN lt IS NULL OR len(lt) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE lt END) AS tok
        FROM (
          SELECT doc_id,
            list_filter(list_distinct(string_split(text, ' ')), t -> length(t) > 5) AS lt
          FROM documents
        ) ORDER BY doc_id, tok NULLS FIRST
      """.trim)),

    // MapType surface: parse JSON props to MAP<STRING,INT>, inspect, and
    // serialize back (Spark and DuckDB agree on compact to_json format).
    Op("fn_map_json",
      (s, dir) => {
        import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
        Tables.events(s, dir)
          .select(col("event_id"),
            from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
          // Key list dumped as a joined string (SURVEY §2.0 rule 8 — no
          // ARRAY columns in the dumped frame); map surface stays internal.
          .select(col("event_id"),
            array_join(map_keys(col("m")), ",").as("ks"),
            element_at(col("m"), "k").as("k_val"),
            to_json(col("m")).as("js"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, 'k' AS ks, CAST(props->>'$.k' AS INT) AS k_val,
          CAST(to_json(map(['k'], [CAST(props->>'$.k' AS INT)])) AS VARCHAR) AS js
        FROM events ORDER BY event_id
      """.trim)),

    // Spark 4 VARIANT surface: parse JSON into the binary semi-structured
    // type, typed-extract fields, introspect. VARIANT itself never reaches
    // the dumped frame (rule 8) — only extracted scalars do.
    Op("fn_variant",
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("event_id"), parse_json(col("props")).as("v"))
          .select(col("event_id"),
            expr("variant_get(v, '$.k', 'int')").as("k_val"),
            expr("schema_of_variant(v)").as("v_schema"),
            expr("is_variant_null(v)").as("is_null"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, CAST(props->>'$.k' AS INT) AS k_val,
          'OBJECT<k: BIGINT>' AS v_schema, false AS is_null
        FROM events ORDER BY event_id
      """.trim)),

    Op("fn_string_extra",
      (s, dir) => {
        Tables.t(s, dir, "customer").select(
          col("c_custkey"),
          reverse(col("c_mktsegment")).as("rev_seg"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("trans_seg"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("joined"),
          expr("repeat('*', c_nationkey % 5)").as("stars"),
          expr("left(c_name, 8)").as("l8"),
          expr("right(c_name, 3)").as("r3"),
          expr("startswith(c_name, 'Customer')").as("is_cust"),
          expr("endswith(c_mktsegment, 'RY')").as("ends_ry"),
          expr("contains(c_name, '00')").as("has_00"),
          expr("CAST(instr(c_name, '#') AS INT)").as("hash_pos"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, reverse(c_mktsegment) AS rev_seg,
          translate(c_mktsegment, 'AEIOU', 'aeiou') AS trans_seg,
          concat_ws('-', c_mktsegment, c_name) AS joined,
          repeat('*', CAST(c_nationkey % 5 AS INT)) AS stars,
          left(c_name, 8) AS l8, right(c_name, 3) AS r3,
          starts_with(c_name, 'Customer') AS is_cust,
          ends_with(c_mktsegment, 'RY') AS ends_ry,
          contains(c_name, '00') AS has_00,
          CAST(instr(c_name, '#') AS INT) AS hash_pos
        FROM customer ORDER BY c_custkey
      """.trim)),

    // Edit-distance family: levenshtein is the one string-similarity
    // primitive both engines implement identically (classic DP).
    Op("fn_levenshtein",
      (s, dir) => {
        Tables.t(s, dir, "customer").select(
          col("c_custkey"),
          levenshtein(col("c_name"), lit("Customer#000000000")).cast("int").as("dist_name"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("int").as("dist_seg"),
          levenshtein(substring(col("c_name"), 10, 9),
            substring(reverse(col("c_name")), 1, 9)).cast("int").as("dist_digits"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey,
          CAST(levenshtein(c_name, 'Customer#000000000') AS INT) AS dist_name,
          CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS dist_seg,
          CAST(levenshtein(substring(c_name, 10, 9), substring(reverse(c_name), 1, 9)) AS INT) AS dist_digits
        FROM customer ORDER BY c_custkey
      """.trim)),

    Op("fn_bitwise",
      (s, dir) => {
        Tables.t(s, dir, "orders").select(
          col("o_orderkey"),
          expr("o_orderkey & 255").as("band"),
          expr("o_orderkey | 4096").as("bor"),
          expr("o_orderkey ^ 1023").as("bxor"),
          expr("shiftleft(o_orderkey, 2)").as("shl"),
          expr("shiftright(o_orderkey, 3)").as("shr"),
          expr("~o_orderkey").as("bnot"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderkey & 255 AS band, o_orderkey | 4096 AS bor,
          xor(o_orderkey, 1023) AS bxor, o_orderkey << 2 AS shl,
          o_orderkey >> 3 AS shr, ~o_orderkey AS bnot
        FROM orders ORDER BY o_orderkey
      """.trim)),

    Op("fn_struct_nested",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
          .withColumn("s", struct(col("c_custkey").as("id"), col("c_mktsegment").as("seg")))
        // Struct built and field-accessed internally; dumped as a flat
        // string (SURVEY §2.0 rule 8 — no STRUCT columns in the dumped frame).
        c.select(col("c_custkey"),
            concat(lit("id="), col("s.id").cast("string"), lit(";seg="), col("s.seg")).as("s_str"),
            col("s.seg").as("seg_again"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, 'id=' || c_custkey || ';seg=' || c_mktsegment AS s_str,
          c_mktsegment AS seg_again
        FROM customer ORDER BY c_custkey
      """.trim)),

    // try_cast — the safe-cast ingestion surface: a deterministically
    // poisoned string column (every 7th part's size prefixed with 'x')
    // parsed back with TRY_CAST semantics — bad cells become NULL, never
    // exceptions, and the report counts both populations plus the sum of
    // what parsed. The row-local dual of src_csv_corrupt_records' parse
    // quarantine: this is how a 100 TB ingest survives a dirty column
    // without a single task retry.
    Op("fn_try_cast",
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
        p.select(
            when(col("p_partkey") % 7 === 0,
              concat(lit("x"), col("p_size").cast("string")))
              .otherwise(col("p_size").cast("string")).as("raw"))
          .select(expr("try_cast(raw AS INT)").as("v"))
          .agg(
            sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_parsed"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_failed"),
            sum(col("v").cast("long")).as("size_sum"))
      },
      Some("""
        SELECT
          CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
          CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
          CAST(SUM(v) AS BIGINT) AS size_sum
        FROM (
          SELECT TRY_CAST(CASE WHEN p_partkey % 7 = 0
            THEN 'x' || CAST(p_size AS VARCHAR)
            ELSE CAST(p_size AS VARCHAR) END AS INT) AS v
          FROM part)
      """.trim)),

    // XML parsing family: typed XPath extraction (xpath_long /
    // xpath_string) and schema-directed from_xml over a per-row XML
    // payload built from orders columns. The extraction must round-trip
    // the original values exactly, so the oracle is the source columns
    // themselves — the same identity-oracle stance as the source
    // round-trips. Row-local and codegen-adjacent (one scan, no
    // shuffle besides the presentation sort); pairs with fn_json /
    // fn_variant to complete the semi-structured parsing surface.
    Op("fn_xml",
      (s, dir) => {
        Tables.t(s, dir, "orders")
          .where(col("o_orderkey") <= 2000)
          .withColumn("xml", expr(
            """concat('<o><k>', CAST(o_orderkey AS STRING),
               '</k><p>', o_orderpriority,
               '</p><c>', CAST(o_custkey AS STRING), '</c></o>')"""))
          .select(
            expr("xpath_long(xml, '/o/k/text()')").as("k"),
            expr("xpath_string(xml, '/o/p/text()')").as("priority"),
            expr("from_xml(xml, 'k BIGINT, p STRING, c BIGINT').c").as("custkey"))
          .orderBy("k")
      },
      Some("""
        SELECT o_orderkey AS k, o_orderpriority AS priority,
          o_custkey AS custkey
        FROM orders WHERE o_orderkey <= 2000 ORDER BY k
      """.trim))
  )
}

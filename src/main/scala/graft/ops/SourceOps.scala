package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group A — source/sink connectors (SURVEY.md §2.1 A): parquet scan plus
  * CSV/JSON round-trips with EXPLICIT schemas on read-back (inferSchema is
  * both slow and a determinism risk). Every Verify parquet dump is itself
  * the parquet-sink test. JDBC/Kafka: out of scope (zero-egress).
  */
object SourceOps extends OpGroup {

  private def tmpDir(prefix: String): String = Tables.tmpDir(prefix)

  /** src_zorder_write's fixture: orders written partitioned by z-range
    * bucket. Built once per (session, sfDir); released after the consumer
    * key runs (Tables.sharedWrite).
    */
  def zorderDemo(s: org.apache.spark.sql.SparkSession, dir: String): String =
    Tables.sharedWrite(s, dir, "zorder_demo", Set("src_zorder_write")) { o =>
      Tables.t(s, dir, "orders")
        .withColumn("z", expr(zorderSpark))
        .withColumn("zbucket",
          expr("CAST(ntile(8) OVER (ORDER BY z, o_orderkey) AS INT)"))
        .repartition(col("zbucket"))
        .write.mode("overwrite").partitionBy("zbucket").parquet(o)
    }

  /** The AT-SCALE z-order write path (SURVEY §7.6's stance, coded round
    * 12). [[zorderDemo]]'s NTILE over a global ORDER BY is deterministic
    * — which the DuckDB oracle needs — but plans a SINGLE-PARTITION
    * window: correct at verification SFs, a scale-killer at 100 TB. The
    * production layout replaces it with repartitionByRange(z): the
    * RangePartitioner SAMPLES boundary values (one lightweight pass) and
    * places rows with an ordinary range exchange — no window, no global
    * sort — then sorts within partitions so every output file is
    * internally z-clustered. Bucket membership becomes sample-dependent
    * (not oracle-reproducible), so this path is pinned by PlanSuite
    * instead: plan shape (range exchange present, zero Window, zero
    * global Sort) plus the property the layout exists for — per-bucket
    * z ranges are pairwise disjoint, so a z-range predicate prunes
    * whole buckets.
    */
  private[graft] def zorderScaleFrame(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables.t(s, dir, "orders")
      .withColumn("z", expr(zorderSpark))
      .repartitionByRange(8, col("z"), col("o_orderkey"))
      .sortWithinPartitions("z", "o_orderkey")
      .withColumn("zbucket", spark_partition_id())

  /** Spark 4 ships the avro source inside spark-sql, but this image's jar
    * set lacks the `avro` short-name service registration — the
    * fully-qualified format class resolves the same code path.
    */
  private val avroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  private val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  private val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val ops: Seq[Op] = Seq(
    Op("src_parquet_scan",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber")
          .limit(100)
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100
      """.trim)),

    // Lossless CSV round-trip: write with header, read back with explicit
    // schema; the oracle is the original table (round-trip must not change
    // values). 2-dp doubles survive text round-trip exactly (shortest-repr
    // write, exact re-parse); decimal cast on output pins the compare.
    Op("src_csv_roundtrip",
      (s, dir) => {
        val out = tmpDir("graft_csv")
        Tables.t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.schema(customerSchema).option("header", "true").csv(out)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal").cast(DecimalType(12, 2)).cast("double").as("acctbal"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_nationkey,
          CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal, c_mktsegment
        FROM customer ORDER BY c_custkey
      """.trim)),

    // Partitioned parquet sink + partition-pruned read-back: the layout
    // that matters at 100 TB (directory-level pruning on the partition
    // column). The read-back filter prunes to 2 of 7 year directories.
    Op("src_partitioned_write",
      (s, dir) => {
        val out = tmpDir("graft_part")
        Tables.t(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")).cast("int"))
          // Shuffle by the partition column before the partitioned write:
          // otherwise every one of the 32 input tasks opens a writer per
          // year directory (~32×7 small files); co-locating each year in
          // one task writes 1 file per directory — the layout a downstream
          // partition-pruned scan wants at any scale.
          .repartition(col("o_year"))
          .write.mode("overwrite").partitionBy("o_year").parquet(out)
        s.read.parquet(out)
          .filter(col("o_year").isin(1996, 1997))
          .groupBy("o_year")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).cast("double").as("sum_price"))
          .orderBy("o_year")
      },
      Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997)
        GROUP BY 1 ORDER BY o_year
      """.trim)),

    // ORC round-trip (Spark-native columnar format beside parquet): write,
    // read back with explicit schema, compare against the original table —
    // the round-trip must be lossless. DuckDB can't read ORC, so the
    // oracle is the source table itself (same pattern as CSV).
    Op("src_orc_roundtrip",
      (s, dir) => {
        val out = tmpDir("graft_orc")
        Tables.t(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
          .write.mode("overwrite").orc(out)
        s.read.schema(supplierSchema).orc(out)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
            col("s_acctbal").cast(DecimalType(12, 2)).cast("double").as("acctbal"))
          .orderBy("s_suppkey")
      },
      Some("""
        SELECT s_suppkey, s_name, s_nationkey,
          CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
        FROM supplier ORDER BY s_suppkey
      """.trim)),

    // Avro round-trip (row-oriented interchange format; in Spark 4 the
    // avro source is built into spark-sql). Write, read back with explicit
    // schema, compare against the source table — lossless. DuckDB can't
    // read Avro natively here, so the oracle is the source table (same
    // pattern as ORC/CSV).
    Op("src_avro_roundtrip",
      (s, dir) => {
        val out = tmpDir("graft_avro")
        Tables.t(s, dir, "part")
          .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
          .write.mode("overwrite").format(avroFormat).save(out)
        s.read.schema(partSchema).format(avroFormat).load(out)
          .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
            col("p_size"),
            col("p_retailprice").cast(DecimalType(12, 2)).cast("double").as("retailprice"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey, p_name, p_brand, p_type, p_size,
          CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS retailprice
        FROM part ORDER BY p_partkey
      """.trim)),

    Op("src_json_roundtrip",
      (s, dir) => {
        val out = tmpDir("graft_json")
        Tables.t(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite").json(out)
        s.read.schema(nationSchema).json(out)
          .orderBy("n_nationkey")
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation ORDER BY n_nationkey
      """.trim)),

    // Schema evolution: two parquet batches with compatible-but-different
    // schemas (the second adds a column) land in one directory; a
    // mergeSchema read unifies them, null-filling the old batch — the
    // lake-ingest reality every long-lived dataset hits. Batches derive
    // deterministically from orders (1995 without, 1996 with o_priority);
    // the oracle rebuilds the same union. At 100 TB the unified schema
    // comes from the table catalog, not per-query footer merging — but
    // the null-fill semantics verified here are identical.
    Op("src_schema_evolution",
      (s, dir) => {
        val out = tmpDir("graft_evolve")
        val o = Tables.t(s, dir, "orders")
        o.filter(year(col("o_orderdate")) === 1995)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$out/b=1")
        o.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority").as("o_priority"))
          .write.mode("overwrite").parquet(s"$out/b=2")
        s.read.option("mergeSchema", "true").parquet(out)
          .groupBy("b", "o_priority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DecimalType(18, 2)).cast("double").as("sum_price"))
          .orderBy(col("b"), col("o_priority").asc_nulls_first)
      },
      Some("""
        SELECT b, o_priority, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
        FROM (
          SELECT 1 AS b, o_orderkey, o_totalprice, NULL AS o_priority
          FROM orders WHERE year(o_orderdate) = 1995
          UNION ALL
          SELECT 2 AS b, o_orderkey, o_totalprice, o_orderpriority AS o_priority
          FROM orders WHERE year(o_orderdate) = 1996
        )
        GROUP BY b, o_priority
        ORDER BY b, o_priority ASC NULLS FIRST
      """.trim)),

    // Z-order layout write: interleave (o_custkey, orderdate-epoch-day)
    // into a Morton code, bucket by z-range, write partitioned by bucket,
    // and report each bucket's (custkey, date) bounding box from the
    // read-back — narrow boxes are WHY the layout prunes multi-dimensional
    // predicates (a filter on either dimension skips most buckets via
    // file/partition min-max stats, which a single-column sort can give
    // only for its leading column). The bit-spread is plain integer
    // arithmetic, identical in both engines. NTILE over the total order
    // (z, o_orderkey) makes the 8 range buckets deterministic for the
    // oracle; at 100 TB the same boundaries come from repartitionByRange
    // on z (sampled, not globally sorted) and the box report reads file
    // footer stats instead of scanning.
    Op("src_zorder_write",
      (s, dir) => {
        // The z-ordered layout is written once per (session, sfDir)
        // (Tables.sharedWrite; Bench warms it untimed) — the key's time
        // then measures the read-back box report that PROVES the layout
        // prunes, which is the mechanism under demonstration.
        val out = SourceOps.zorderDemo(s, dir)
        s.read.parquet(out)
          .groupBy("zbucket")
          .agg(count(lit(1)).as("n"),
            min("o_custkey").as("min_cust"), max("o_custkey").as("max_cust"),
            min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("min_date"),
            max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("max_date"))
          .orderBy("zbucket")
      },
      Some(s"""
        WITH z AS (
          SELECT o_custkey, o_orderdate, $zorderDuck AS z, o_orderkey
          FROM orders
        )
        SELECT zbucket, COUNT(*) AS n,
          MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
          MIN(strftime(o_orderdate, '%Y-%m-%d')) AS min_date,
          MAX(strftime(o_orderdate, '%Y-%m-%d')) AS max_date
        FROM (SELECT CAST(NTILE(8) OVER (ORDER BY z, o_orderkey) AS INT) AS zbucket,
                o_custkey, o_orderdate FROM z)
        GROUP BY zbucket ORDER BY zbucket
      """.trim)),

    // Parse-time quarantine: PERMISSIVE CSV ingestion of a poisoned batch.
    // `nation` is written clean, then a part file of 3 deterministically
    // malformed lines is dropped into the directory — the shape of a bad
    // upstream delivery. The read uses an explicit schema +
    // columnNameOfCorruptRecord, so malformed lines land whole in
    // `_corrupt_record` instead of failing the job, and the report proves
    // the good rows survived intact (key checksum) while every bad line
    // was captured. Measured Spark CSV semantics the fixture encodes:
    // (a) arity mismatches are padded/truncated SILENTLY (not corrupt) —
    // only type-conversion failure triggers the corrupt column; (b) CSV
    // column pruning (on by default) means a bad cell is only DETECTED
    // when the query parses that column — a failure in an unread column
    // sails through. So every poisoned line fails in n_nationkey, which
    // the report reads. At 100 TB this is the ingestion contract: parse
    // errors are data, never exceptions — the parse-level sibling of
    // etl_quarantine's rule-level gate — and (b) is why a quarantine
    // pass must SELECT every contracted column.
    Op("src_csv_corrupt_records",
      (s, dir) => {
        val out = tmpDir("graft_corrupt")
        Tables.t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .coalesce(1).write.mode("overwrite").csv(out)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "part-poisoned.csv"),
          "xx,BADLAND,1\nnotanint,X,7\n4.5,TOOMANY,9\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val schema = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType),
          StructField("_corrupt_record", StringType)))
        s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(out)
          .agg(
            sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
            sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_bad"),
            sum(when(col("_corrupt_record").isNull, col("n_nationkey").cast("long")))
              .as("key_sum"))
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_good, CAST(3 AS BIGINT) AS n_bad,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        FROM nation
      """.trim)),

    // Raw-asset ingestion via the binaryFile source — how a multimodal
    // pipeline STARTS at 100 TB: a landing zone of opaque files becomes a
    // DataFrame of (path, length, content: binary) rows feeding the
    // decode/feature-extract stubs downstream. Fixture: the first 20
    // docs land as one text file each (partitioned text write; docs are
    // measured newline-free so file content = text + '\n' exactly). The
    // report is order-insensitive: file count, total bytes, Σ of 48-bit
    // md5(content) prefixes (48, not 60: the sum of 60-bit values
    // overflows BIGINT under ANSI arithmetic) — a content checksum no file ordering can
    // perturb. Spark md5 runs on raw binary; the oracle reproduces the
    // digests from the source table (same UTF-8 bytes + chr(10)).
    Op("src_binary_files",
      (s, dir) => {
        val out = tmpDir("graft_bin")
        Tables.t(s, dir, "documents")
          .filter(col("doc_id") < 20).select(col("doc_id"), col("text"))
          .write.mode("overwrite").partitionBy("doc_id").text(out)
        s.read.format("binaryFile")
          .option("pathGlobFilter", "*.txt").option("recursiveFileLookup", "true")
          .load(out)
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("length")).as("total_bytes"),
            sum(expr("CAST(conv(substring(md5(content), 1, 12), 16, 10) AS BIGINT)"))
              .as("sig_sum"))
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
          CAST(SUM(strlen(text) + 1) AS BIGINT) AS total_bytes,
          CAST(SUM(CAST(('0x' || substring(md5(text || chr(10)), 1, 12)) AS BIGINT)) AS BIGINT) AS sig_sum
        FROM documents WHERE doc_id < 20
      """.trim)),

    // Line-oriented text source roundtrip — the rawest ingest format a
    // corpus pipeline meets (one record per line, schema applied by the
    // reader). Docs land as TSV lines via the text sink, come back as a
    // single `value` column, and the reader re-derives (doc_id, lang,
    // text) by a bounded split. Safe here because the corpus is
    // measured newline/tab-free; a real pipeline would JSONL-escape.
    // The whole parse is row-local projection — one scan at any scale —
    // and the oracle recomputes the same aggregates straight from the
    // source table (roundtrip must be the identity).
    Op("src_text_lines",
      (s, dir) => {
        val out = tmpDir("graft_textlines")
        Tables.t(s, dir, "documents")
          .select(concat_ws("\t", col("doc_id"), col("lang"), col("text")).as("value"))
          .write.mode("overwrite").text(out)
        val parts = split(col("value"), "\t", 3)
        s.read.text(out)
          .select(parts.getItem(0).cast("long").as("doc_id"),
            parts.getItem(1).as("lang"),
            parts.getItem(2).as("text"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("sum_chars"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(strlen(text)) AS BIGINT) AS sum_chars,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM documents GROUP BY lang ORDER BY lang
      """.trim)),

    // XML round-trip (the xml source is native in spark-sql 4): write
    // `part` as element-per-row XML, read back with an explicit schema,
    // compare against the original table — the round-trip must be
    // lossless (entity escaping included; the writer escapes <>& in
    // element text and the reader restores them). DuckDB can't read XML,
    // so the oracle is the source table itself (the ORC/CSV pattern).
    // 2-dp doubles survive the text round-trip exactly (shortest-repr
    // write, exact re-parse); the decimal cast on output pins the
    // compare.
    Op("src_xml_roundtrip",
      (s, dir) => {
        val out = tmpDir("graft_xml")
        Tables.t(s, dir, "part")
          .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
          .write.mode("overwrite").format("xml")
          .option("rootTag", "parts").option("rowTag", "part").save(out)
        s.read.format("xml").option("rowTag", "part")
          .schema("p_partkey LONG, p_name STRING, p_brand STRING, p_size INT, p_retailprice DOUBLE")
          .load(out)
          .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
            col("p_retailprice").cast(DecimalType(12, 2)).cast("double").as("retailprice"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey, p_name, p_brand, p_size,
          CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS retailprice
        FROM part ORDER BY p_partkey
      """.trim)),

    // Transaction-log snapshot reconstruction — the MECHANISM behind every
    // lakehouse table format (Delta/Iceberg/Hudi), expressed Spark-first
    // with zero format dependencies: a table is a directory of data files
    // plus an ordered log of JSON commits, each adding/removing files; the
    // current snapshot is "replay the log, read the files whose LAST
    // action is add". The fixture is a deterministic 3-commit history over
    // customer: commit 0 adds f0 (custkey%3=0) and f1 (%3=1), commit 1
    // adds f2 (%3=2), commit 2 REWRITES f1 as f3 with acctbal+100 (the
    // compaction/update shape: remove + add in one atomic commit). Replay
    // is one tiny aggregate over the log (argmax commit per path — the
    // log is KBs while the data is TBs, the asymmetry the design exists
    // for); the snapshot read unions exactly the live files, so
    // time-travel is the same replay with a commit ceiling. The oracle
    // restates the expected snapshot from customer directly (same
    // deterministic predicates), proving the replay semantics — file
    // pruning via the log, stale data invisible after the rewrite.
    Op("src_txn_log_snapshot",
      (s, dir) => txnLogRead(s, dir, asOf = Int.MaxValue),
      Some("""
        WITH snapshot AS (
          SELECT c_mktsegment, c_acctbal FROM customer WHERE c_custkey % 3 <> 1
          UNION ALL
          SELECT c_mktsegment, c_acctbal + 100.0 FROM customer WHERE c_custkey % 3 = 1
        )
        SELECT c_mktsegment, COUNT(*) AS n,
          CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents
        FROM snapshot GROUP BY c_mktsegment ORDER BY c_mktsegment
      """.trim)),

    // TIME TRAVEL over the same transaction log: replay with a commit
    // CEILING (as-of commit 1 — before the f1→f3 rewrite landed) and the
    // pre-update balances are visible again. The ceiling is ONE filter on
    // the KB-sized log; no data file is rewritten, versioned, or copied —
    // the entire versioning cost of a lakehouse table lives in the log,
    // which is the design's whole point. The oracle restates the as-of
    // snapshot as the unmodified base table.
    Op("src_txn_log_time_travel",
      (s, dir) => txnLogRead(s, dir, asOf = 1),
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
          CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
      """.trim)),

    // LOG COMPACTION + VACUUM AUDIT — the maintenance third of the
    // lakehouse triplet (snapshot read, time travel, and now the daily
    // run that keeps them fast): (1) CHECKPOINT — materialize the live
    // set as of a commit ceiling as its own artifact beside the log, so
    // a reader replays checkpoint + log-tail instead of the whole
    // history (the log grows forever; the checkpoint caps replay cost);
    // (2) prove the checkpointed replay reconstructs the full replay
    // exactly (set-equal live paths — the correctness gate a real
    // compactor must pass before swapping readers over); (3) VACUUM
    // AUDIT — every data file whose LAST log action is remove is orphaned
    // bytes the table no longer reads; report it with its reclaimable
    // rows/cents. The audit is ONE globbed scan of the data directory
    // with input_file_name() grouped per file — never a per-file driver
    // loop — joined to the log's argmax action; at 100 TB that scan is
    // the listing join the snapshot op's scaladoc promises (millions of
    // files = a DataFrame, not a driver list), and the DELETE this
    // report drives is withheld here only because the fixture is shared
    // with the other two keys. Oracle restates the expected ledger from
    // customer via the fixture's deterministic predicates.
    Op("src_txn_log_compact",
      (s, dir) => {
        val root = txnLogFixture(s, dir)
        val log = s.read
          .schema("commit INT, action STRING, path STRING")
          .json(s"$root/log")
        val ceiling = 1
        // Checkpoint: live set as of the ceiling, written as an artifact
        // (its own dir — the log dir must stay pure commit lines).
        val ckptLive = log.filter(col("commit") <= ceiling)
          .groupBy("path")
          .agg(max(struct(col("commit"), col("action"))).as("last"))
          .filter(col("last.action") === "add")
          .select(col("path"), lit(ceiling).as("ceiling"))
        ckptLive.coalesce(1).write.mode("overwrite").json(s"$root/ckpt")
        val ckpt = s.read.schema("path STRING, ceiling INT").json(s"$root/ckpt")
        // Tail replay: checkpoint paths count as adds at the ceiling,
        // then only commits PAST the ceiling replay on top.
        val tail = log.filter(col("commit") > ceiling)
        val fromCkpt = ckpt
          .select(col("path"), lit(ceiling).as("commit"), lit("add").as("action"))
          .union(tail.select("path", "commit", "action"))
          .groupBy("path")
          .agg(max(struct(col("commit"), col("action"))).as("last"))
          .filter(col("last.action") === "add").select("path")
        val full = log.groupBy("path")
          .agg(max(struct(col("commit"), col("action"))).as("last"))
          .filter(col("last.action") === "add").select("path")
        val ckptMatch = fromCkpt.exceptAll(full)
          .union(full.exceptAll(fromCkpt)).isEmpty
        val ckptLiveN = ckpt.count()
        val tailN = tail.select("commit").distinct().count()
        // Vacuum audit: one scan of the whole data dir, file identity
        // from input_file_name, status from the log's argmax action.
        // recursiveFileLookup on the concrete dir (a glob here resolves,
        // but Spark's FileStreamSink.hasMetadata probe stats the literal
        // glob string and stack-traces a FileNotFound into the log).
        val files = s.read.option("recursiveFileLookup", "true")
          .parquet(s"$root/data")
          .withColumn("path",
            regexp_extract(input_file_name(), "/data/([^/]+)/", 1))
          .groupBy("path")
          .agg(count(lit(1)).as("n_rows"),
            sum(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")).as("bal_cents"))
        val status = log.groupBy("path")
          .agg(max(col("commit")).as("last_commit"),
            max(struct(col("commit"), col("action"))).as("last"))
          .select(col("path"), col("last_commit"),
            when(col("last.action") === "add", "live")
              .otherwise("orphan").as("status"))
        files.join(status, "path")
          .select(col("path"), col("last_commit").cast("int").as("last_commit"),
            col("status"), col("n_rows"), col("bal_cents"))
          .withColumn("ckpt_live", lit(ckptLiveN))
          .withColumn("tail_commits", lit(tailN))
          .withColumn("checkpoint_match", lit(ckptMatch))
          .orderBy("path")
      },
      Some("""
        WITH f AS (
          SELECT 'f0' AS path, 0 AS last_commit, 'live' AS status,
            (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 0) AS n_rows,
            (SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_custkey % 3 = 0) AS bal_cents
          UNION ALL
          SELECT 'f1', 2, 'orphan',
            (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 1),
            (SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_custkey % 3 = 1)
          UNION ALL
          SELECT 'f2', 1, 'live',
            (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 2),
            (SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_custkey % 3 = 2)
          UNION ALL
          SELECT 'f3', 2, 'live',
            (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 1),
            (SELECT CAST(SUM(CAST(round((c_acctbal + 100.0) * 100, 0) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_custkey % 3 = 1))
        SELECT path, CAST(last_commit AS INT) AS last_commit, status, n_rows, bal_cents,
          CAST(3 AS BIGINT) AS ckpt_live, CAST(1 AS BIGINT) AS tail_commits,
          TRUE AS checkpoint_match
        FROM f ORDER BY path
      """.trim)),

    // MULTI-WRITER transaction-log commit (round-17 verdict item 4) —
    // the optimistic-concurrency protocol that lets independent jobs
    // write ONE lakehouse table with no lock service: a writer lands its
    // data file (path unique per writer — data writes can never clash),
    // then claims the next commit id by ATOMICALLY creating the log file
    // (CREATE_NEW — the POSIX/object-store primitive Delta's
    // put-if-absent commit builds on); the loser's create throws
    // FileAlreadyExistsException, it re-lists the log and retries at the
    // next id. This op stages the WORST interleaving deterministically:
    // both writers read the log at the same point (both compute next=0),
    // writer 0 wins commit 0, writer 1's attempt at 0 conflicts and
    // lands at commit 1 — exactly one detected conflict, by
    // construction. The final argmax replay must equal the serial truth
    // (both files live, order irrelevant — committed APPENDS commute),
    // asserted in-band by the serial_match flag (loud-guard stance) and
    // pinned in EquivalenceSuite, which also races REAL threads through
    // the same commitWithRetry. At 100 TB this is the property that lets
    // N ingest pipelines share a table: conflicts cost one retry each,
    // never a lost or duplicated commit, and the coordination state is
    // the KB-sized log itself.
    Op("src_txn_log_concurrent",
      (s, dir) => {
        val root = Tables.tmpDir("graft_txn_concurrent")
        val logDir = java.nio.file.Paths.get(root, "log")
        java.nio.file.Files.createDirectories(logDir)
        val c = Tables.t(s, dir, "customer")
          .select("c_custkey", "c_mktsegment", "c_acctbal")
        def writeFile(name: String, df: org.apache.spark.sql.DataFrame): Unit =
          df.coalesce(1).write.mode("overwrite").parquet(s"$root/data/$name")
        writeFile("w0", c.filter(col("c_custkey") % 2 === 0))
        writeFile("w1", c.filter(col("c_custkey") % 2 === 1))
        // Both writers observed the log BEFORE either committed — the
        // stale-read interleaving every OCC protocol must survive.
        val staleNext = nextCommitId(logDir)
        val (id0, n0) = commitWithRetry(logDir, staleNext,
          id => s"""{"commit": $id, "action": "add", "path": "w0"}""")
        val (id1, n1) = commitWithRetry(logDir, staleNext,
          id => s"""{"commit": $id, "action": "add", "path": "w1"}""")
        require(id0 == 0 && id1 == 1 && n0 == 0 && n1 == 1,
          s"staged collision must land (0 clean, 1 after one conflict); " +
            s"got w0=($id0,$n0 conflicts) w1=($id1,$n1)")
        // Snapshot replay (the src_txn_log_snapshot argmax rule) vs the
        // serial truth read straight off the base table.
        val live = s.read
          .schema("commit INT, action STRING, path STRING")
          .json(s"$root/log")
          .groupBy("path")
          .agg(max(struct(col("commit"), col("action"))).as("last"))
          .filter(col("last.action") === "add")
          .select("path").collect().map(_.getString(0)).sorted
        def agg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")).as("bal_cents"))
        val replayed = agg(
          s.read.parquet(live.map(p => s"$root/data/$p").toIndexedSeq: _*))
        def key(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1).toSeq
        val serialMatch = key(replayed) == key(agg(c))
        replayed
          .select(col("c_mktsegment"), col("n"), col("bal_cents"),
            lit(2L).as("n_commits"), lit((n0 + n1).toLong).as("conflicts"),
            lit(serialMatch).as("serial_match"))
          .orderBy("c_mktsegment")
      },
      None),

    // SCHEMA EVOLUTION through the transaction log (round-18 verdict
    // item 4) — the lakehouse answer to "the table's shape changed but
    // petabytes of old files must stay readable": commit 0 declares
    // schema v0 (bal_cents INT) and adds f0 written under it; commit 1
    // is a pure `"action":"schema"` record declaring v1 — bal_cents
    // WIDENED int→bigint plus a NEW c_nationkey column — touching no
    // data file; commit 2 adds f1 written under v1. A snapshot read
    // serves the LATEST schema: files are grouped by the schema_id their
    // add action recorded (groups are bounded by |schema versions|,
    // never |files| — the at-scale property; no per-file driver loop),
    // each group is read under its own physical schema and ALIGNED to
    // the table schema — missing columns NULL-backfilled, narrower
    // integers cast up; a time-travel read with ceiling 0 serves v0's
    // 3 columns untouched (old readers see the old shape — in-band
    // v1_cols/v1_rows columns prove it). parquet mergeSchema cannot do
    // this (INT vs BIGINT conflict fails the merge) — the log's schema
    // actions are the authority, exactly Delta/Iceberg's metadata
    // action. The multi-writer race with a schema-action commit in
    // flight is pinned in EquivalenceSuite (commitWithRetry resolves it
    // like any other commit — schema changes are just commits).
    Op("src_txn_log_schema_evolution",
      (s, dir) => {
        val root = Tables.tmpDir("graft_txn_schema")
        val logDir = java.nio.file.Paths.get(root, "log")
        java.nio.file.Files.createDirectories(logDir)
        val c = Tables.t(s, dir, "customer")
        c.filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            expr("CAST(round(c_acctbal * 100, 0) AS INT)").as("bal_cents"))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/data/f0")
        c.filter(col("c_custkey") % 2 === 1)
          .select(col("c_custkey"), col("c_mktsegment"),
            expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("bal_cents"),
            col("c_nationkey"))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/data/f1")
        val v0 = "c_custkey BIGINT, c_mktsegment STRING, bal_cents INT"
        val v1 = "c_custkey BIGINT, c_mktsegment STRING, bal_cents BIGINT, c_nationkey INT"
        def put(id: Int, lines: String*): Unit =
          java.nio.file.Files.write(logDir.resolve(f"$id%03d.json"),
            lines.mkString("\n").getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
        put(0,
          s"""{"commit": 0, "action": "schema", "schema_id": 0, "schema": "$v0"}""",
          s"""{"commit": 0, "action": "add", "path": "f0", "schema_id": 0}""")
        put(1,
          s"""{"commit": 1, "action": "schema", "schema_id": 1, "schema": "$v1"}""")
        put(2,
          s"""{"commit": 2, "action": "add", "path": "f1", "schema_id": 1}""")
        val snapshot = schemaEvolvedRead(s, root, asOf = Int.MaxValue)
        val asOf0 = schemaEvolvedRead(s, root, asOf = 0)
        snapshot.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum("bal_cents").as("bal_cents"),
            sum(when(col("c_nationkey").isNull, 1L).otherwise(0L))
              .as("n_backfilled"),
            sum(coalesce(col("c_nationkey").cast("long"), lit(0L)))
              .as("nation_sum"))
          .withColumn("v1_cols", lit(asOf0.schema.size))
          .withColumn("v1_rows", lit(asOf0.count()))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
          CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents,
          CAST(SUM(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled,
          CAST(SUM(CASE WHEN c_custkey % 2 = 1 THEN c_nationkey ELSE 0 END) AS BIGINT) AS nation_sum,
          CAST(3 AS INT) AS v1_cols,
          (SELECT COUNT(*) FROM customer WHERE c_custkey % 2 = 0) AS v1_rows
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
      """.trim)),

    // VACUUM — the DELETE that src_txn_log_compact's audit deliberately
    // withholds (its fixture is shared): physically reclaim data files
    // whose LAST log action is `remove` at or before the retention
    // horizon, then PROVE the three contracts a production vacuum must
    // keep, all in-band: (1) the snapshot is untouched — the post-delete
    // argmax replay re-aggregates BIT-IDENTICAL to the serial truth off
    // the base table (snapshot_match; a vacuum that ate a live file
    // flips it and the hash goes red — the loud-guard stance); (2) time
    // travel BEFORE the horizon is genuinely gone — the asOf=1 replay's
    // required file set now intersects the deleted set
    // (tt_pre_horizon_readable=false), which is the documented price of
    // reclamation, not a bug (Delta's VACUUM carries the same warning);
    // (3) the reclaimed bytes are exactly the audit's ledger — the
    // per-file rows (computed from ONE pre-delete scan of the data dir,
    // input_file_name-grouped, never a per-file driver loop) restate
    // against the oracle's customer predicates. The horizon here is a
    // commit id; at 100 TB it is a timestamp mapped through the log's
    // commit metadata, and the orphan listing join (log argmax ⋈ file
    // listing) is DataFrame-sized for millions of files — the only
    // driver-side state is the ≤|files| ledger this 4-file fixture
    // collects for the report.
    Op("src_txn_log_vacuum",
      (s, dir) => {
        import s.implicits._
        val root = Tables.tmpDir("graft_txn_vacuum")
        vacuumRootSeam.put((s, dir), root) // test-seam publish only (EquivalenceSuite)
        val c = Tables.t(s, dir, "customer")
          .select("c_custkey", "c_mktsegment", "c_acctbal")
        def writeFile(name: String, df: org.apache.spark.sql.DataFrame): Unit =
          df.coalesce(1).write.mode("overwrite").parquet(s"$root/data/$name")
        writeFile("f0", c.filter(col("c_custkey") % 3 === 0))
        writeFile("f1", c.filter(col("c_custkey") % 3 === 1))
        writeFile("f2", c.filter(col("c_custkey") % 3 === 2))
        writeFile("f3", c.filter(col("c_custkey") % 3 === 1)
          .withColumn("c_acctbal", col("c_acctbal") + 100.0))
        val logDir = java.nio.file.Paths.get(root, "log")
        java.nio.file.Files.createDirectories(logDir)
        def commit(id: Int, actions: Seq[(String, String)]): Unit =
          java.nio.file.Files.write(logDir.resolve(f"$id%03d.json"),
            actions.map { case (act, path) =>
              s"""{"commit": $id, "action": "$act", "path": "$path"}"""
            }.mkString("\n").getBytes("UTF-8"))
        commit(0, Seq("add" -> "f0", "add" -> "f1"))
        commit(1, Seq("add" -> "f2"))
        commit(2, Seq("remove" -> "f1", "add" -> "f3"))
        val log = s.read
          .schema("commit INT, action STRING, path STRING")
          .json(s"$root/log")
        // Pre-delete ledger: ONE recursive scan of the data dir joined to
        // the log's argmax action (the src_txn_log_compact audit shape).
        val status = log.groupBy("path")
          .agg(max(col("commit")).as("last_commit"),
            max(struct(col("commit"), col("action"))).as("last"))
          .select(col("path"), col("last_commit"),
            (col("last.action") === "add").as("live"))
        val ledger = s.read.option("recursiveFileLookup", "true")
          .parquet(s"$root/data")
          .withColumn("path",
            regexp_extract(input_file_name(), "/data/([^/]+)/", 1))
          .groupBy("path")
          .agg(count(lit(1)).as("n_rows"),
            sum(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")).as("bal_cents"))
          .join(status, "path")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getInt(3), r.getBoolean(4)))
          .sortBy(_._1).toSeq
        // VACUUM: delete every orphan whose remove landed at or before
        // the horizon (= current head here — retention 0).
        val horizon = 2
        val vacuumed = ledger.collect {
          case (p, _, _, lastC, false) if lastC <= horizon => p
        }.toSet
        vacuumed.foreach(p => Tables.deleteRecursively(
          java.nio.file.Paths.get(root, "data", p)))
        // Contract 1: post-delete snapshot replay == serial truth.
        val liveNow = log
          .groupBy("path")
          .agg(max(struct(col("commit"), col("action"))).as("last"))
          .filter(col("last.action") === "add")
          .select("path").collect().map(_.getString(0)).sorted
        def agg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")).as("bal_cents"))
        def key(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1).toSeq
        val snapAfter = agg(
          s.read.parquet(liveNow.map(p => s"$root/data/$p").toIndexedSeq: _*))
        val truth = agg(c.withColumn("c_acctbal",
          when(col("c_custkey") % 3 === 1, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal"))))
        val snapshotMatch = key(snapAfter) == key(truth)
        // Contract 2: the asOf=1 replay's required files intersect the
        // deleted set — pre-horizon time travel is gone by construction.
        val neededAt1 = log.filter(col("commit") <= 1)
          .groupBy("path")
          .agg(max(struct(col("commit"), col("action"))).as("last"))
          .filter(col("last.action") === "add")
          .select("path").collect().map(_.getString(0)).toSet
        val ttReadable = neededAt1.forall(p =>
          java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, "data", p)))
        val reclaimedRows = ledger.collect {
          case (p, n, _, _, _) if vacuumed(p) => n }.sum
        val reclaimedCents = ledger.collect {
          case (p, _, cents, _, _) if vacuumed(p) => cents }.sum
        ledger.map { case (p, n, cents, lastC, _) =>
          (p, lastC, if (vacuumed(p)) "vacuumed" else "live", n, cents)
        }.toDF("path", "last_commit", "status", "n_rows", "bal_cents")
          .withColumn("vacuumed_files", lit(vacuumed.size.toLong))
          .withColumn("reclaimed_rows", lit(reclaimedRows))
          .withColumn("reclaimed_cents", lit(reclaimedCents))
          .withColumn("snapshot_match", lit(snapshotMatch))
          .withColumn("tt_pre_horizon_readable", lit(ttReadable))
          .orderBy("path")
      },
      Some("""
        WITH f AS (
          SELECT 'f0' AS path, 0 AS last_commit, 'live' AS status,
            (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 0) AS n_rows,
            (SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_custkey % 3 = 0) AS bal_cents
          UNION ALL
          SELECT 'f1', 2, 'vacuumed',
            (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 1),
            (SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_custkey % 3 = 1)
          UNION ALL
          SELECT 'f2', 1, 'live',
            (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 2),
            (SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_custkey % 3 = 2)
          UNION ALL
          SELECT 'f3', 2, 'live',
            (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 1),
            (SELECT CAST(SUM(CAST(round((c_acctbal + 100.0) * 100, 0) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_custkey % 3 = 1))
        SELECT path, CAST(last_commit AS INT) AS last_commit, status,
          n_rows, bal_cents,
          CAST(1 AS BIGINT) AS vacuumed_files,
          (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 1) AS reclaimed_rows,
          (SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
           FROM customer WHERE c_custkey % 3 = 1) AS reclaimed_cents,
          TRUE AS snapshot_match,
          FALSE AS tt_pre_horizon_readable
        FROM f ORDER BY path
      """.trim)),

    // RESTORE — roll the table BACK to an earlier version as a NEW
    // forward commit (Delta's RESTORE TABLE ... VERSION AS OF): diff the
    // two live sets (current head vs the as-of target), then commit
    // remove(head∖target) + add(target∖head) through the SAME optimistic
    // commitWithRetry path every writer uses — restore is an ordinary
    // commit racing rivals, not a log rewrite. The inverse of vacuum on
    // the history axis: vacuum destroys pre-horizon time travel to
    // reclaim bytes; restore moves the HEAD while destroying nothing —
    // every data file stays, and the pre-restore head remains readable
    // as-of its commit (prerestore_tt_match proves it in-band: the asOf=2
    // replay still re-aggregates to the REWRITTEN truth after the restore
    // lands). The restore itself is one KB-sized log append; no data file
    // is copied or deleted — at 100 TB rolling back a bad compaction or a
    // poisoned ingest is a metadata operation, which is the whole reason
    // the log-of-file-actions design wins over rewrite-in-place. The diff
    // legs are log-replay aggregates (KB-sized); the oracle restates the
    // post-restore snapshot from customer directly — a restore that
    // missed either diff leg serves f3's rewritten balances (or drops f1)
    // and the hash goes red.
    Op("src_txn_log_restore",
      (s, dir) => {
        val root = Tables.tmpDir("graft_txn_restore")
        val c = Tables.t(s, dir, "customer")
          .select("c_custkey", "c_mktsegment", "c_acctbal")
        def writeFile(name: String, df: org.apache.spark.sql.DataFrame): Unit =
          df.coalesce(1).write.mode("overwrite").parquet(s"$root/data/$name")
        writeFile("f0", c.filter(col("c_custkey") % 3 === 0))
        writeFile("f1", c.filter(col("c_custkey") % 3 === 1))
        writeFile("f2", c.filter(col("c_custkey") % 3 === 2))
        writeFile("f3", c.filter(col("c_custkey") % 3 === 1)
          .withColumn("c_acctbal", col("c_acctbal") + 100.0))
        val logDir = java.nio.file.Paths.get(root, "log")
        java.nio.file.Files.createDirectories(logDir)
        def commit(id: Int, actions: Seq[(String, String)]): Unit =
          java.nio.file.Files.write(logDir.resolve(f"$id%03d.json"),
            actions.map { case (act, path) =>
              s"""{"commit": $id, "action": "$act", "path": "$path"}"""
            }.mkString("\n").getBytes("UTF-8"))
        commit(0, Seq("add" -> "f0", "add" -> "f1"))
        commit(1, Seq("add" -> "f2"))
        commit(2, Seq("remove" -> "f1", "add" -> "f3"))
        def liveAsOf(asOf: Int): Seq[String] = s.read
          .schema("commit INT, action STRING, path STRING")
          .json(s"$root/log")
          .filter(col("commit") <= asOf)
          .groupBy("path")
          .agg(max(struct(col("commit"), col("action"))).as("last"))
          .filter(col("last.action") === "add")
          .select("path").collect().map(_.getString(0)).sorted.toSeq
        val target = 1
        val headLive = liveAsOf(Int.MaxValue).toSet
        val targetLive = liveAsOf(target).toSet
        val toRemove = (headLive -- targetLive).toSeq.sorted
        val toAdd = (targetLive -- headLive).toSeq.sorted
        val (restoreCommit, _) = commitWithRetry(logDir, nextCommitId(logDir),
          id => (toRemove.map(p =>
              s"""{"commit": $id, "action": "remove", "path": "$p"}""")
            ++ toAdd.map(p =>
              s"""{"commit": $id, "action": "add", "path": "$p"}"""))
            .mkString("\n"))
        def agg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")).as("bal_cents"))
        def replay(paths: Seq[String]) = agg(
          s.read.parquet(paths.map(p => s"$root/data/$p").toIndexedSeq: _*))
        def digest(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1).toSeq
        // History preserved: the PRE-restore head (asOf=2) still serves
        // the rewritten balances even though the new head rolled back.
        val rewrittenTruth = agg(c.withColumn("c_acctbal",
          when(col("c_custkey") % 3 === 1, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal"))))
        val prerestoreMatch =
          digest(replay(liveAsOf(2))) == digest(rewrittenTruth)
        replay(liveAsOf(Int.MaxValue))
          .withColumn("restore_commit", lit(restoreCommit))
          .withColumn("files_removed", lit(toRemove.size.toLong))
          .withColumn("files_added", lit(toAdd.size.toLong))
          .withColumn("prerestore_tt_match", lit(prerestoreMatch))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
          CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents,
          CAST(3 AS INT) AS restore_commit,
          CAST(1 AS BIGINT) AS files_removed,
          CAST(1 AS BIGINT) AS files_added,
          TRUE AS prerestore_tt_match
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
      """.trim))
  )

  /** Replay `root`'s transaction log up to `asOf` and serve the live
    * files under the latest schema action's shape: live paths are
    * grouped by the schema_id their add action recorded, each group read
    * under its own physical schema (from the log's schema records — the
    * log, not the files, is the authority) and aligned to the target —
    * absent columns NULL-backfilled, present columns cast to the target
    * type (the widening path). Group count is bounded by the number of
    * schema versions ever declared, so the per-group loop is metadata-
    * sized at any corpus scale. private[graft]: EquivalenceSuite replays
    * a log written by racing writers through this exact reader.
    */
  private[graft] def schemaEvolvedRead(
      s: org.apache.spark.sql.SparkSession, root: String,
      asOf: Int): org.apache.spark.sql.DataFrame = {
    val log = s.read
      .schema("commit INT, action STRING, path STRING, schema_id INT, schema STRING")
      .json(s"$root/log")
      .filter(col("commit") <= asOf)
    val schemas = log.filter(col("action") === "schema")
      .select("schema_id", "schema").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val target = org.apache.spark.sql.types.StructType
      .fromDDL(schemas(schemas.keys.max))
    val liveRows = log.filter(col("action").isin("add", "remove"))
      .groupBy("path")
      .agg(max(struct(col("commit"), col("action"))).as("last"),
        max(when(col("action") === "add", col("schema_id"))).as("sid"))
      .filter(col("last.action") === "add")
      .select("path", "sid").collect()
    liveRows.groupBy(_.getInt(1)).toSeq.sortBy(_._1).map { case (sid, rows) =>
      val df = s.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(schemas(sid)))
        .parquet(rows.map(r => s"$root/data/${r.getString(0)}").toIndexedSeq: _*)
      val have = df.columns.toSet
      df.select(target.fields.toIndexedSeq.map { f =>
        if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }.reduce(_.unionAll(_))
  }

  /** Fixture root of the last src_txn_log_vacuum invocation, keyed by
    * (session, sfDir) — WRITE-ONLY in the op body; EquivalenceSuite reads
    * it to assert the physical delete actually happened (f1 gone,
    * f0/f2/f3 intact). Registered with the stopped-session sweep so a
    * long-lived process can't retain dead SessionStates (round-18
    * advice pattern).
    */
  private val vacuumRootSeam = graft.Caches.sweepWith(
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String), String])
  private[graft] def lastVacuumRoot(
      s: org.apache.spark.sql.SparkSession, sfDir: String): String =
    vacuumRootSeam((s, sfDir))

  /** Next commit id = 1 + the highest id in the log (0 on an empty log)
    * — what an optimistic writer computes from its snapshot read. Only
    * `NNN.json` entries count: a stray non-log file in the dir (editor
    * temp, partial upload, checksum sidecar) must not crash every
    * subsequent commit with a NumberFormatException (round-18 advice).
    */
  private val CommitFileName = """(\d+)\.json""".r
  private[graft] def nextCommitId(logDir: java.nio.file.Path): Int = {
    val ls = java.nio.file.Files.list(logDir)
    try {
      var mx = -1
      ls.forEach { p =>
        p.getFileName.toString match {
          case CommitFileName(n) => mx = math.max(mx, n.toInt)
          case _                 => ()
        }
      }
      mx + 1
    } finally ls.close()
  }

  /** Optimistic-concurrency commit: atomically CREATE_NEW the attempt's
    * log file; when another writer already owns that id
    * (FileAlreadyExistsException — the atomic put-if-absent losing leg)
    * re-list the log and retry at the fresh next id. Returns the id that
    * finally landed plus the number of conflicts survived. Lock-free and
    * wait-free modulo rivals committing (each retry means someone ELSE
    * made progress). Note CREATE_NEW-then-write is create THEN write: a
    * concurrent lister can observe a created-but-empty log file. Benign
    * here (readers consume the log only after all commits land); a real
    * object-store txn log makes the content atomic too — write to a temp
    * name, then put-if-absent via atomic rename. private[graft]:
    * EquivalenceSuite races real threads through this exact code.
    */
  private[graft] def commitWithRetry(
      logDir: java.nio.file.Path,
      firstAttempt: Int,
      record: Int => String): (Int, Int) = {
    var id = firstAttempt
    var conflicts = 0
    while (true) {
      try {
        java.nio.file.Files.write(logDir.resolve(f"$id%03d.json"),
          record(id).getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        return (id, conflicts)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          conflicts += 1
          id = math.max(id + 1, nextCommitId(logDir))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Shared 3-commit transaction-log fixture over customer (built once
    * per (session, sfDir); released after both consumer keys run):
    * commit 0 adds f0 (custkey%3=0) + f1 (%3=1), commit 1 adds f2
    * (%3=2), commit 2 atomically rewrites f1 as f3 with acctbal+100.
    */
  /** Setups.warm hook: build the shared txn-log fixture untimed (round-19
    * verdict item 4 — the 4-file + 3-commit write was landing inside the
    * FIRST consumer's timed region; the replay/read is the mechanism the
    * keys demonstrate, the fixture write is not — the round-6 precedent
    * that moved the other demo layouts to Setups).
    */
  private[graft] def txnLogDemo(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    txnLogFixture(s, dir); ()
  }

  private def txnLogFixture(
      s: org.apache.spark.sql.SparkSession, dir: String): String =
    Tables.sharedWrite(s, dir, "txnlog_demo",
      Set("src_txn_log_snapshot", "src_txn_log_time_travel",
        "src_txn_log_compact")) { root =>
      val c = Tables.t(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      def writeFile(name: String, df: org.apache.spark.sql.DataFrame): Unit =
        df.coalesce(1).write.mode("overwrite").parquet(s"$root/data/$name")
      writeFile("f0", c.filter(col("c_custkey") % 3 === 0))
      writeFile("f1", c.filter(col("c_custkey") % 3 === 1))
      writeFile("f2", c.filter(col("c_custkey") % 3 === 2))
      writeFile("f3", c.filter(col("c_custkey") % 3 === 1)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0))
      val log = java.nio.file.Paths.get(root, "log")
      java.nio.file.Files.createDirectories(log)
      def commit(id: Int, actions: Seq[(String, String)]): Unit =
        java.nio.file.Files.write(log.resolve(f"$id%03d.json"),
          actions.map { case (act, path) =>
            s"""{"commit": $id, "action": "$act", "path": "$path"}"""
          }.mkString("\n").getBytes("UTF-8"))
      commit(0, Seq("add" -> "f0", "add" -> "f1"))
      commit(1, Seq("add" -> "f2"))
      commit(2, Seq("remove" -> "f1", "add" -> "f3"))
    }

  /** Replay the log up to `asOf` (inclusive): a path is live iff its
    * LAST action within the ceiling is add; read exactly the live files.
    */
  private def txnLogRead(
      s: org.apache.spark.sql.SparkSession, dir: String,
      asOf: Int): org.apache.spark.sql.DataFrame = {
    val root = txnLogFixture(s, dir)
    val live = s.read
      .schema("commit INT, action STRING, path STRING")
      .json(s"$root/log")
      .filter(col("commit") <= asOf)
      .groupBy("path")
      .agg(max(struct(col("commit"), col("action"))).as("last"))
      .filter(col("last.action") === "add")
      .select("path")
      .collect().map(_.getString(0)).sorted
    s.read.parquet(live.map(p => s"$root/data/$p").toIndexedSeq: _*)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")).as("bal_cents"))
      .orderBy("c_mktsegment")
  }

  /** Morton interleave of (o_custkey, orderdate-epoch-day), 16 bits each,
    * via the classic mask cascade — generated for BOTH engines from one
    * mask table so the arithmetic cannot diverge. Only the shift syntax
    * differs (Spark `shiftleft(x, n)`, DuckDB `x << n`).
    */
  private lazy val spreadMasks =
    Seq((8, 16711935L), (4, 252645135L), (2, 858993459L), (1, 1431655765L))

  private def spread(e: String, shl: (String, Int) => String): String =
    spreadMasks.foldLeft(s"(($e) & 65535)") { case (a, (sh, m)) =>
      s"((($a) | ${shl(a, sh)}) & $m)" }

  private def zorder(x: String, y: String, shl: (String, Int) => String): String =
    s"(${spread(x, shl)} | ${shl(spread(y, shl), 1)})"

  private lazy val zorderSpark = zorder(
    "o_custkey", "datediff(o_orderdate, DATE'1970-01-01')",
    (e, n) => s"shiftleft(($e), $n)")

  private lazy val zorderDuck = zorder(
    "o_custkey", "datediff('day', DATE '1970-01-01', o_orderdate)",
    (e, n) => s"(($e) << $n)")
}

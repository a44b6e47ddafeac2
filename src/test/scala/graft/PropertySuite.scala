package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Relational-algebra invariants over arbitrary generated frames
  * (SURVEY.md §5 layer 2). Plain ScalaCheck Gen sampling (scalatestplus
  * bridge isn't in the offline dependency set); seeds are fixed so runs
  * are reproducible. Sizes kept small — each check runs Spark jobs.
  */
class PropertySuite extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rowsGen = Gen.listOf(Gen.zip(Gen.choose(0, 10), Gen.choose(-100, 100)))

  private def samples(n: Int): Seq[List[(Int, Int)]] =
    (0 until n).flatMap(i => rowsGen(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  test("every text_*/corpus_* op survives an adversarial corpus (empty/1-word/unicode/newline docs)") {
    // The `nw >= 2` class of bug (round-9 verdict item 8): empty docs,
    // 1-word docs, whitespace-only text, unicode, embedded newlines/tabs
    // were guarded ad hoc per op. This runs the WHOLE text/corpus family
    // over a corpus made of nothing but those edge cases, asserting
    // no-throw — the key list is derived from SparkEntry.queries, so a
    // new text op is covered the day it lands.
    val docs = Seq(
      (1L, "", "en", "src0", 0L),                                    // empty
      (2L, "word", "en", "src0", 4L),                                // 1 word
      (3L, "a b", "en", "src0", 3L),                                 // < 3-shingle
      (4L, "héllo wörld ünïcode 日本語 🚀 ok", "zz", "src1", 24L), // unicode + emoji
      (5L, "line1\nline2\ttab  doubled  spaces", "en", "src1", 32L), // newline/tab/runs
      (6L, "   ", "en", "src0", 3L),                                 // whitespace-only
      (7L, "the the the the", "en", "src0", 15L),                    // all-stopword repeat
      (8L, "word", "en", "src2", 4L))                                // exact dup of 2
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = miniDir("documents" -> docs)
    val keys = SparkEntry.queries.keySet.toSeq.sorted
      .filter(k => k.startsWith("text_") || k.startsWith("corpus_"))
    assert(keys.size >= 30, s"text/corpus family shrank? found ${keys.size}")
    val failures = keys.flatMap { k =>
      try { SparkEntry.queries(k)(spark, dir).collect(); None }
      catch { case e: Throwable => Some(s"$k: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every vec_*/graph_*/multimodal_* op survives an adversarial embedding table " +
    "(zero vectors incl. the query, exact duplicates, sub-k corpus)") {
    // The vector twin of the adversarial-corpus gate: a zero QUERY vector
    // makes every cosine NaN (0/0), a zero corpus vector NaNs one side,
    // exact duplicates force sim ties at the top-k boundary, and a corpus
    // smaller than k/cluster counts exercises the empty-cell paths. The
    // bar is no-throw; NaN-valued outputs are legal. Key list derives
    // from SparkEntry.queries so new vector ops are covered on landing.
    def v(pos: Int): Array[Float] = {
      val a = Array.fill(64)(0f); if (pos >= 0) a(pos) = 1f; a
    }
    val emb = Seq(
      (0L, v(-1), 0),  // ZERO query vector → all sims NaN
      (1L, v(0), 0),
      (2L, v(0), 0),   // exact duplicate of 1 → top-k tie
      (3L, v(1), 0),
      (4L, v(2), 1),
      (5L, v(-1), 1),  // zero corpus vector
      (6L, v(3), 1))
      .toDF("vec_id", "embedding", "label")
    val docs = Seq(
      (1L, "", "en", "src0", 0L),
      (2L, "word", "en", "src0", 4L),
      (3L, "a b c", "en", "src1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // graph_pagerank_step builds its edges from lineitem⋈orders, not the
    // embedding graph — give it a two-edge world.
    val li = Seq((1L, 10L), (2L, 11L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((1L, 20L), (2L, 21L)).toDF("o_orderkey", "o_custkey")
    val dir = miniDir(
      "embeddings" -> emb, "documents" -> docs, "lineitem" -> li, "orders" -> ord)
    val keys = SparkEntry.queries.keySet.toSeq.sorted.filter(k =>
      k.startsWith("vec_") || k.startsWith("graph_") || k.startsWith("multimodal_"))
    assert(keys.size >= 25, s"vector family shrank? found ${keys.size}")
    val failures = keys.flatMap { k =>
      try { SparkEntry.queries(k)(spark, dir).collect(); None }
      catch { case e: Throwable => Some(s"$k: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("cardinality algebra: |A semi B| <= |A|, |A unionAll B| = |A|+|B|") {
    samples(4).grouped(2).collect { case Seq(a, b) =>
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      assert(da.join(db, Seq("k"), "left_semi").count() <= da.count())
      assert(da.unionAll(db).count() == da.count() + db.count())
    }.toList
  }

  test("semi + anti partition the left side") {
    samples(4).grouped(2).collect { case Seq(a, b) =>
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      val semi = da.join(db, Seq("k"), "left_semi").count()
      val anti = da.join(db, Seq("k"), "left_anti").count()
      assert(semi + anti == da.count())
    }.toList
  }

  test("decimal SUM is partitioning-invariant") {
    samples(3).filter(_.nonEmpty).foreach { a =>
      val df = a.toDF("k", "v").select(col("v").cast("decimal(18,2)").as("v"))
      val s1 = df.coalesce(1).agg(sum("v")).head.getDecimal(0)
      val s4 = df.repartition(4).agg(sum("v")).head.getDecimal(0)
      assert(s1 == s4)
    }
  }

  test("row_number is a permutation of 1..n per partition key") {
    import org.apache.spark.sql.expressions.Window
    samples(3).filter(_.nonEmpty).foreach { a =>
      val df = a.zipWithIndex.map { case ((k, v), i) => (k, v, i) }.toDF("k", "v", "id")
      val w = Window.partitionBy("k").orderBy("v", "id")
      val rns = df.withColumn("rn", row_number().over(w))
        .groupBy("k").agg(collect_list("rn").as("rns"))
        .collect()
      rns.foreach { r =>
        val l = r.getSeq[Int](1)
        assert(l.sorted == (1 to l.size).toList)
      }
    }
  }

  test("rollup total row equals grand total") {
    samples(3).foreach { a =>
      val df = a.toDF("k", "v")
      val roll = df.rollup("k").agg(count(lit(1)).as("n")).collect()
      val total = roll.filter(_.isNullAt(0)).map(_.getLong(1)).sum
      assert(total == df.count())
    }
  }

  test("dedup idempotence") {
    samples(3).foreach { a =>
      val df = a.toDF("k", "v")
      val d1 = df.dropDuplicates()
      assert(d1.dropDuplicates().count() == d1.count())
    }
  }

  test("skew salting preserves join semantics for arbitrary frames") {
    samples(4).grouped(2).collect { case Seq(a, b) =>
      val fact = a.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "row_id")
      val dim = b.map(_._1).distinct.zipWithIndex.map { case (k, i) => (k, s"d$i") }
        .toDF("k", "attr")
      val plain = fact.join(dim, Seq("k"))
        .select("row_id", "attr").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val saltedDim = dim.withColumn("salt", explode(expr("sequence(0, 3)")))
      val saltedFact = fact.withColumn("salt", expr("CAST(row_id % 4 AS INT)"))
      val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
        .select("row_id", "attr").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(salted == plain)
    }.toList
  }

  test("upsert is idempotent: applying the same changes twice changes nothing") {
    samples(4).grouped(2).collect { case Seq(a, b) =>
      val base = a.groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }.toSeq.toDF("k", "v")
      val changes = b.groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }.toSeq.toDF("k", "nv")
      def upsert(cur: org.apache.spark.sql.DataFrame) = cur
        .join(changes, Seq("k"), "full")
        .select(col("k"), coalesce(col("nv"), col("v")).as("v"))
      val once = upsert(base).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val twice = upsert(upsert(base)).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(twice == once)
      // |merged| = |base| + |insert-only keys|.
      val baseKeys = base.select("k").collect().map(_.getInt(0)).toSet
      val chKeys = changes.select("k").collect().map(_.getInt(0)).toSet
      assert(once.size == baseKeys.size + (chKeys -- baseKeys).size)
    }.toList
  }

  test("minhash_sketch aggregate is partitioning-invariant (distributive merge)") {
    Tables.conf(spark)
    samples(3).filter(_.nonEmpty).foreach { a =>
      val df = a.toDF("k", "v").select(col("k"), col("v").cast("long").as("th"))
      def sig(d: org.apache.spark.sql.DataFrame) = d
        .groupBy("k").agg(expr("minhash_sketch(th, 8)").as("sig"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      assert(sig(df.coalesce(1)) == sig(df.repartition(8)))
    }
  }

  test("chunking with overlap covers every character and reconstructs the doc") {
    // Every document position is covered by >=1 chunk; concatenating each
    // chunk's non-overlapping prefix (the stride) plus the final chunk's
    // tail reconstructs the document exactly.
    val rows = SparkEntry.queries("text_chunk_overlap")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) =>
      if (text.nonEmpty) {
        val chunks = rows(id).sortBy(_._2)
        assert(chunks.head._2 == 0L, s"doc $id: first chunk must start at 0")
        // Strides are contiguous: each chunk starts exactly 400 after the
        // previous, and each chunk spans past the next start (overlap > 0)
        // unless it is the last.
        chunks.sliding(2).foreach {
          case Array((_, s1, c1), (_, s2, _)) =>
            assert(s2 == s1 + 400, s"doc $id: stride gap at $s1")
            assert(s1 + c1.length > s2, s"doc $id: no overlap at $s1")
          case _ => ()
        }
        val rebuilt = chunks.map { case (_, start, c) =>
          if (start == chunks.last._2) c else c.take(400)
        }.mkString
        assert(rebuilt == text, s"doc $id: reconstruction mismatch")
      }
    }
  }

  test("cluster-contraction connected components == union-find on random graphs") {
    // The cluster-contraction loop (PipelineOps.connectedComponents) is
    // the one custom iterative algorithm in the engine; the DuckDB oracle
    // only exercises the corpus graphs, so pin it here against a textbook
    // union-find over random edge sets — including long chains, which is
    // the shape where a broken jump step would diverge (a chain's
    // diameter is what the jump collapses).
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)))
    val cases = (0 until 6).flatMap(i =>
      edgeGen(Gen.Parameters.default.withSize(25), Seed(1000L + i))) :+
      (0L to 30L).sliding(2).map(s => (s.head, s.last)).toList // 30-long chain
    cases.filter(_.nonEmpty).foreach { raw =>
      val es = raw.filter { case (a, b) => a != b }
      if (es.nonEmpty) {
        // Reference union-find with path compression.
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        // Canonicalize: every node labeled with the MIN node of its root's
        // component (union-find roots aren't min by construction).
        val byRoot = nodes.groupBy(find)
        val expected = byRoot.values.flatMap { members =>
          val m = members.min; members.map(_ -> m)
        }.toMap
        val got = ops.PipelineOps.connectedComponents(
            es.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"CC mismatch on ${es.size} edges")
        // Same graph FORCED multi-partition: a tiny rows-per-partition
        // target makes the local union-find see only fragments of each
        // component, so the GLOBAL contraction loop must do the real
        // cross-partition merging (at test sizes the default coalesces to
        // one partition and the local UF alone would solve everything —
        // this leg keeps the loop itself pinned).
        val gotMulti = ops.PipelineOps.connectedComponents(
            es.toDF("a", "b").repartition(5), ufRowsPerPartition = 2L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotMulti == expected,
          s"multi-partition CC mismatch on ${es.size} edges")
      }
    }
  }

  test("connected components label self-loop-only nodes as their own singletons") {
    // The documented contract is a label for EVERY edge-incident node; a
    // self-loop carries no connectivity but its node is edge-incident.
    // Node 7 appears only as (7,7); node 2 has a self-loop AND a real
    // edge — it must take its component's min, not a duplicate singleton.
    val got = ops.PipelineOps.connectedComponents(
        Seq((7L, 7L), (2L, 2L), (2L, 9L), (4L, 5L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted
    assert(got.toSeq == Seq(2L -> 2L, 4L -> 4L, 5L -> 4L, 7L -> 7L, 9L -> 2L))
  }

  test("connected components reject non-integral id columns loudly") {
    // The union-find stage routes ids through cast("long"); a double or
    // string id would truncate silently and corrupt labels (round-11
    // advice). The seam must throw, not mislabel.
    val doubles = intercept[IllegalArgumentException] {
      ops.PipelineOps.connectedComponents(
        Seq((1.5, 2.0), (2.0, 3.5)).toDF("a", "b"))
    }
    assert(doubles.getMessage.contains("integral"))
    val strings = intercept[IllegalArgumentException] {
      ops.PipelineOps.connectedComponents(
        Seq(("x", "y")).toDF("a", "b"))
    }
    assert(strings.getMessage.contains("integral"))
  }

  test("round-8/9 keys are partitioning-invariant (digest equal at 3 vs 11 shuffle partitions)") {
    // The 100 TB correctness property: a result that changes with the
    // shuffle-partition count has an order-dependent accumulation hiding
    // in it (float sums, nondeterministic ties). Run each listed key at
    // two co-prime partition counts and compare the order-insensitive
    // Golden digest. sf0.001 keeps this cheap (<1 s/run).
    val keys = Seq(
      "vec_kmeans_train", "quality_ks_drift", "graph_triangle_count",
      "vec_recall_eval", "win_cumulative_distinct", "ts_attribution_last_touch",
      "multimodal_infer_batched", "vec_matryoshka_recall", "text_span_novelty",
      "ts_forecast_eval_naive", "quality_column_profile", "join_asof_tolerance",
      // The float-surfacing older keys — the set where an order-dependent
      // accumulation would most plausibly hide.
      "agg_stats", "agg_linreg", "agg_higher_moments", "agg_weighted_percentile",
      "ts_ewma", "ts_cusum_changepoint", "vec_power_iteration",
      "vec_ivf_topk", "text_tfidf_topterms", "quality_drift_report",
      // Round-9 keys, float-surfacing or loop-bearing first.
      "vec_silhouette", "text_char_entropy", "ts_acf", "ts_dow_profile",
      "ts_yoy_growth", "win_pareto_abc", "quality_benford",
      "graph_connected_components", "ts_interval_union",
      "ts_transition_matrix", "link_fuzzy_blocked", "corpus_token_budget",
      "sample_split_train_test", "win_gaps_islands", "ts_rolling_median",
      "etl_late_arriving_dim", "win_range_time_frame", "agg_welch_ttest",
      "agg_chi_square", "agg_gini", "etl_table_checksum",
      // The statistical/curve keys added after the µs-testdata cutover —
      // every one carries a float surface (rank z, ln/exp curve, Pearson
      // quotient, MAD quotient, Flesch milli-points).
      "agg_mann_whitney", "ts_survival_km", "ts_xcorr", "ts_anomaly_mad",
      "graph_label_prop_step", "text_readability", "vec_auc_roc",
      "vec_mips_topk", "agg_log_histogram", "etl_bitemporal_asof",
      "quality_freshness_report", "ts_active_users_rolling",
      "win_drawdown", "vec_maxsim_topk", "join_asof_nearest",
      "ts_burstiness", "etl_retention_ttl",
      // Round-10 additions over the shared token-tf checkpoint + the
      // integer gram matrix — each carries a per-group summation whose
      // order-insensitivity (micro-unit rounding before the sum) is the
      // exact property this gate checks.
      "text_lm_perplexity", "text_zipf_fit", "vec_gram_matrix",
      // Round-12 additions: the augmented-cosine MIPS route (float cosine
      // cut + float ip re-rank), the BPE fold (order-sensitive if the
      // merge list ever stopped being rank-sorted), the √-weight
      // temperature mix (Σ√cnt must fold in lang order), the per-qid
      // batched ranking, the Holt recursion (fold over the day-sorted
      // series), and the vote-window confusion rollup.
      "vec_mips_via_cosine", "text_bpe_apply", "corpus_temperature_sample",
      "vec_ivf_batch_topk", "ts_holt_linear", "text_langid_confusion")
    val conf = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(conf)
    try keys.foreach { k =>
      val digests = Seq("3", "11").map { p =>
        spark.conf.set(conf, p)
        Golden.digest(SparkEntry.queries(k)(spark, sf0001), k)
      }
      assert(digests(0) == digests(1),
        s"$k output depends on shuffle partitioning: ${digests(0)} vs ${digests(1)}")
    } finally spark.conf.set(conf, prev)
  }
}

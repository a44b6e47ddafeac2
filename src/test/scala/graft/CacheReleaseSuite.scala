package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared checkpoint caches (simhash sigs/edges/labels, n-gram
  * shingles) must not pin block-manager blocks past their last consumer —
  * round 4 measured monotone block growth across the 132-key bench as the
  * plausible cause of downstream-key inflation. This suite drives the
  * consumer keys the way Bench does (run key → Caches.keyDone) and
  * asserts residency returns to its starting level.
  */
class CacheReleaseSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private val simFamily = Seq(
    "text_simhash", "text_simhash_neardup",
    "text_dedup_clusters", "text_dedup_keep_best")

  test("simhash-family caches release after their last consumer key") {
    val before = Caches.pinnedRddCount(spark)
    simFamily.foreach { k =>
      assert(SparkEntry.queries(k)(spark, dir).count() > 0, s"$k returned 0 rows")
      Caches.keyDone(spark, dir, k)
    }
    val after = Caches.pinnedRddCount(spark)
    assert(after <= before,
      s"pinned RDDs grew across the simhash family: $before -> $after")
  }

  test("ngram shingle checkpoint releases after its consumer key") {
    val before = Caches.pinnedRddCount(spark)
    assert(SparkEntry.queries("text_ngram_jaccard")(spark, dir).count() >= 0)
    Caches.keyDone(spark, dir, "text_ngram_jaccard")
    val after = Caches.pinnedRddCount(spark)
    assert(after <= before,
      s"pinned RDDs grew across text_ngram_jaccard: $before -> $after")
  }

  test("released caches rebuild transparently on the next consumer") {
    // After the release in the previous test the TrieMap entry is gone;
    // a fresh invocation must rebuild and stay oracle-correct (row count
    // pinned by GoldenSuite — here just non-empty and re-releasable).
    assert(SparkEntry.queries("text_dedup_clusters")(spark, dir).count() > 0)
    simFamily.foreach(k => Caches.keyDone(spark, dir, k))
  }
}

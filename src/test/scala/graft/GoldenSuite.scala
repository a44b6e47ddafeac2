package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every query key vs its committed sf0.001 golden digest — the
  * oracle-free regression gate (SURVEY.md §5.3). Catches value drift,
  * schema drift, and row-count drift in one pass; see Golden.scala for
  * the regeneration workflow.
  */
class GoldenSuite extends AnyFunSuite {
  import TestSpark._

  private lazy val golden = Golden.load()

  test("golden file covers exactly the declared query keys") {
    assert(golden.keySet == SparkEntry.queries.keySet,
      s"stale golden file — regenerate with sbt \"Test/runMain graft.GoldenGen\" " +
        s"(missing=${SparkEntry.queries.keySet -- golden.keySet}, " +
        s"extra=${golden.keySet -- SparkEntry.queries.keySet})")
  }

  SparkEntry.queries.foreach { case (key, fn) =>
    test(s"golden: $key") {
      val (n, schema, h) = Golden.digest(fn(spark, sf0001), key)
      val (gn, gschema, gh) = golden(key)
      assert(n == gn, s"$key row count drifted: $n vs golden $gn")
      assert(schema == gschema, s"$key schema drifted:\n  now    $schema\n  golden $gschema")
      assert(h == gh, s"$key values drifted (order-insensitive hash mismatch)")
    }
  }
}

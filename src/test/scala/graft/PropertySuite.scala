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
}

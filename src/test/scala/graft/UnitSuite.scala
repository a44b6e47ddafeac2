package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corner-case units on mini fixtures (FIXTURES.md "unit fixtures"):
  * rows the generated data lacks — ns-timestamp exactness, session-gap
  * boundaries, known-answer jaccard, null-key joins, zero vectors.
  */
class UnitSuite extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("ns→µs recipe: 1706657176220708106 → 2024-01-30T23:26:16.220708") {
    // miniEvents stores raw nanosecond longs exactly like the real table
    // does under nanosAsLong.
    val dir = miniDir("events" -> Seq(
      (0L, 1706657176220708106L, 1L, "click", 1.0, """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val ts = Tables.events(spark, dir).select("ts").as[java.time.LocalDateTime].head()
    assert(ts == java.time.LocalDateTime.parse("2024-01-30T23:26:16.220708"))
  }

  test("session gap boundary: 29m59s same session, 30m01s splits") {
    val min = 60L * 1000 * 1000 * 1000 // ns
    val base = 1704067200L * 1000 * 1000 * 1000
    val dir = miniDir("events" -> Seq(
      (0L, base, 7L, "click", 1.0, "{}"),
      (1L, base + 29 * min + 59L * 1000 * 1000 * 1000, 7L, "view", 1.0, "{}"), // same session
      (2L, base + 60 * min + 1L * 1000 * 1000 * 1000, 7L, "view", 1.0, "{}"), // 30m01s gap → new
      (3L, base, 8L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = SparkEntry.queries("ts_session_gap")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(7L -> 2L, 8L -> 1L))
  }

  test("jaccard known answer: 9-common-of-10-union pair = 0.9, 0.6 pair excluded by threshold") {
    val dir = miniDir("documents" -> Seq(
      (1L, "a b c d e f g h i", "en", "src0", 17L),   // 9 toks
      (2L, "a b c d e f g h i j", "en", "src0", 19L), // ∩=9 ∪=10 → 0.9
      (3L, "a b c x y", "en", "src0", 9L),            // vs 1: ∩=3 ∪=11 → 0.27
      (4L, "", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = SparkEntry.queries("text_near_dup_jaccard")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map((1L, 2L) -> 0.9))
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val dir = miniDir("documents" -> Seq(
      (5L, "dup text", "en", "src0", 8L),
      (2L, "dup text", "en", "src0", 8L),
      (9L, "unique", "en", "src0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = SparkEntry.queries("text_exact_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 2L), (9L, 1L)))
  }

  test("window frames at partition edges: lag null at start, running sum = own value") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val w = Window.partitionBy("k").orderBy("v")
    val got = df
      .withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("run", sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("k", "v")
      .collect().map(r => (r.getInt(0), r.getInt(1), Option(r.get(2)), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, 10, None, 10L), (1, 20, Some(10), 30L), (2, 5, None, 5L)))
  }

  test("null join keys never match (even null<=>null via inner equi-join)") {
    val l = Seq((Some(1), "a"), (None, "b")).toDF("k", "lv")
    val r = Seq((Some(1), "x"), (None, "y")).toDF("k", "rv")
    assert(l.join(r, l("k") === r("k")).count() == 1)
  }

  test("vec_norm: zero vector → 0.0, axis vector → 1.0") {
    val dir = miniDir("embeddings" -> Seq(
      (0L, Array(0f, 0f, 0f), 0),
      (1L, Array(1f, 0f, 0f), 0),
      (2L, Array(3f, 4f, 0f), 1))
      .toDF("vec_id", "embedding", "label"))
    val got = SparkEntry.queries("vec_norm")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(0L -> 0.0, 1L -> 1.0, 2L -> 5.0))
  }

  test("vec_centroid_label: hand-computed centroid, position-ordered") {
    val dir = miniDir("embeddings" -> Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0f, 1f), 0),
      (2L, Array(2f, 2f), 1))
      .toDF("vec_id", "embedding", "label"))
    val got = SparkEntry.queries("vec_centroid_label")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((0, "0.5000,0.5000"), (1, "2.0000,2.0000")))
  }

  test("as-of join: purchase picks most recent prior click, none → null") {
    val sec = 1000L * 1000 * 1000
    val base = 1704067200L * sec
    val dir = miniDir("events" -> Seq(
      (0L, base, 1L, "click", 1.0, "{}"),
      (1L, base + 10 * sec, 1L, "click", 1.0, "{}"),
      (2L, base + 20 * sec, 1L, "purchase", 1.0, "{}"), // → click@+10s
      (3L, base, 2L, "purchase", 1.0, "{}"))            // no prior click → null
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = SparkEntry.queries("join_asof")(spark, dir)
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString)))
    assert(got.toSeq == Seq(
      (2L, Some("2024-01-01T00:00:10")),
      (3L, None)))
  }
}

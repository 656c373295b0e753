package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  test("rrfFuse: hand-computed fusion of two rankings") {
    // system A ranks (10, 20, 30); system B ranks (20, 40)
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val s = 1000000000000L
    val expect = Seq(
      // 20: 1/62 + 1/61 — found by both systems, wins
      (20L, 1, s / 62 + s / 61, 2L),
      (10L, 2, s / 61, 1L), // rank 1 in A
      (40L, 3, s / 62, 1L), // rank 2 in B
      (30L, 4, s / 63, 1L)) // rank 3 in A
    assert(got.toSeq == expect, got.toSeq)
  }

  test("rrfFuse tie-breaks: equal score → more systems win, then smaller id") {
    // id 2 (system A, rank 5) and id 1 (system B, rank 5): equal scores,
    // equal system counts → smaller id ranks first
    val a = Seq((2L, 5)).toDF("id", "rank")
    val b = Seq((1L, 5)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 1), (2L, 2)), got.toSeq)
    // n_systems dominates when scores tie ACROSS different system counts:
    // id 9 at rank 30 twice (2·s/90) vs id 8 at rank 15 once (s/75) —
    // different scores, sanity-check ordering by score first
    val c = Seq((9L, 30), (8L, 15)).toDF("id", "rank")
    val d = Seq((9L, 30)).toDF("id", "rank")
    val got2 = Retrieval.rrfFuse(Seq(c, d), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // 2·(s div 90) = 22222222220 > s div 75 = 13333333333
    assert(got2.toSeq == Seq((9L, 1, 2L), (8L, 2, 1L)), got2.toSeq)
  }

  test("rrfFuse truncates at k with deterministic order") {
    val a = (1 to 100).map(i => (i.toLong, i)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a), "id", "rank", k = 7)
      .collect().map(_.getLong(0))
    assert(got.toSeq == (1L to 7L).toSeq)
  }

  test("rrfFuse refuses empty input") {
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Nil, "id", "rank", k = 5)
    }
  }
}

package graft.lakehouse.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lakehouse.SparkSuite

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def chunksOf(df: DataFrame): Map[Long, Seq[(Int, Long, Long, String)]] =
    df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .groupBy(_._1)
      .map { case (k, v) =>
        k -> v.sortBy(_._2).map(t => (t._2, t._3, t._4, t._5)).toSeq }

  // non-periodic deterministic text (multiplicative hash mix):
  // periodic content would collapse the distinct-sha sets these
  // tests compare
  private val base = (0 until 1800)
    .map(i => ('a' + (((i * 2654435761L) >>> 16) % 26).toInt).toChar)
    .mkString

  test("gearChunks: SHIFT RESISTANCE — a prefix insertion re-aligns " +
    "every chunk after the first boundary; clamps hold") {
    val df = Seq((1L, base), (2L, "PREFIX-INSERTED-BYTES " + base))
      .toDF("doc_id", "text")
    val got = chunksOf(Cdc.gearChunks(df, "doc_id", "text",
      maskBits = 5, minLen = 8, maxLen = 200))
    val shas1 = got(1L).map(_._4).toSet
    val shas2 = got(2L).map(_._4).toSet
    // content-defined: the overwhelming majority of doc-1 chunks
    // reappear verbatim in the shifted doc (only the chunks touching
    // the insertion differ) — fixed-size chunking would share ~none
    val shared = shas1.intersect(shas2).size
    assert(shared >= shas1.size - 2 && shared >= 3,
      s"shared=$shared of ${shas1.size}")
    // clamps: every chunk in [minLen, maxLen] except possibly the tail
    got.values.flatten.toSeq.dropRight(0)
    got.foreach { case (_, cs) =>
      cs.init.foreach { case (_, _, len, _) =>
        assert(len >= 8 && len <= 200, s"clamp violated: $len") }
      assert(cs.last._3 <= 200)
    }
    // chunks tile the document exactly
    got.foreach { case (id, cs) =>
      assert(cs.head._2 == 0L)
      cs.sliding(2).foreach {
        case Seq((_, s1, l1, _), (_, s2, _, _)) => assert(s1 + l1 == s2)
        case _ => }
    }
  }

  test("portableCdcChunks: shift resistance, exact tiling, " +
    "single-chunk short docs, empty/null dropped") {
    val df = Seq((1L, base), (2L, "XY" + base), (3L, "tiny"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = chunksOf(Cdc.portableCdcChunks(df, "doc_id", "text",
      window = 16, modulus = 16L))
    assert(!got.contains(4L))
    // below the window: one whole-document chunk
    assert(got(3L) == Seq((0, 0L, 4L, got(3L).head._4)))
    val shas1 = got(1L).map(_._4).toSet
    val shas2 = got(2L).map(_._4).toSet
    assert(shas1.intersect(shas2).size >= shas1.size - 2,
      s"shared=${shas1.intersect(shas2).size} of ${shas1.size}")
    got.foreach { case (_, cs) =>
      assert(cs.head._2 == 0L)
      cs.sliding(2).foreach {
        case Seq((_, s1, l1, _), (_, s2, _, _)) => assert(s1 + l1 == s2)
        case _ => }
    }
    // deterministic: same input, same boundaries, any partitioning
    val re = chunksOf(Cdc.portableCdcChunks(df.repartition(7),
      "doc_id", "text", window = 16, modulus = 16L))
    assert(re == got)
  }

  test("chunkDupCensus: planted duplicate chunks counted across docs; " +
    "unique chunks filtered out") {
    val df = Seq((1L, base + "one tail"), (2L, base + "other ending"),
      (3L, "completely unrelated text without any shared block"))
      .toDF("doc_id", "text")
    val census = Cdc.chunkDupCensus(
        Cdc.portableCdcChunks(df, "doc_id", "text", 16, 16L), "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(census.nonEmpty, "shared base must produce duplicate chunks")
    assert(census.forall { case (_, occ, docs) =>
      occ >= 2 && docs >= 1 && docs <= occ })
    assert(census.exists(_._3 == 2L), "cross-doc duplicates expected")
  }
}

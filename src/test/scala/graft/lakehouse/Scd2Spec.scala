package graft.lakehouse

/** SCD2 interval derivation from hand-built change-feed rows: update
  * pre/post pairs splice intervals seamlessly, deletes close them, and a
  * delete→reinsert leaves a version gap with two distinct intervals. */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def feed(rows: (Long, String, String, Long)*) =
    rows.toDF("k", "attr", "_change_type", "_commit_version")

  private def scd(rows: (Long, String, String, Long)*) =
    Scd2.fromChangeFeed(feed(rows: _*), Seq("k"))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("attr"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
        r.getAs[Boolean]("is_current")))
      .toSet

  test("insert then update: the pre/post pair closes the old interval " +
      "and opens the new one at the same version") {
    val got = scd(
      (1L, "v1", "insert", 3L),
      (1L, "v1", "update_preimage", 5L),
      (1L, "v2", "update_postimage", 5L))
    assert(got == Set(
      (1L, "v1", 3L, Some(5L), false),
      (1L, "v2", 5L, None, true)))
  }

  test("delete closes; reinsert after delete opens a fresh interval " +
      "(gap preserved)") {
    val got = scd(
      (7L, "a", "insert", 2L),
      (7L, "a", "delete", 4L),
      (7L, "b", "insert", 9L))
    assert(got == Set(
      (7L, "a", 2L, Some(4L), false),
      (7L, "b", 9L, None, true)))
  }

  test("keys never touched after insert stay current; independent keys " +
      "don't interfere") {
    val got = scd(
      (1L, "x", "insert", 2L),
      (2L, "y", "insert", 2L),
      (2L, "y", "update_preimage", 3L),
      (2L, "z", "update_postimage", 3L),
      (2L, "z", "delete", 6L))
    assert(got == Set(
      (1L, "x", 2L, None, true),
      (2L, "y", 2L, Some(3L), false),
      (2L, "z", 3L, Some(6L), false)))
  }

  test("multi-update chain: every interval closes at the next change") {
    val got = scd(
      (5L, "a", "insert", 1L),
      (5L, "a", "update_preimage", 2L),
      (5L, "b", "update_postimage", 2L),
      (5L, "b", "update_preimage", 3L),
      (5L, "c", "update_postimage", 3L))
    assert(got == Set(
      (5L, "a", 1L, Some(2L), false),
      (5L, "b", 2L, Some(3L), false),
      (5L, "c", 3L, None, true)))
  }
}

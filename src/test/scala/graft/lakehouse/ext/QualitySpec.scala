package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("expectations: each check type counts exactly its violations") {
    val df = Seq(
      (Some(1L), Some(10.0), Some("O")),
      (Some(1L), Some(-5.0), Some("X")), // dup key, below range, bad value
      (None, Some(2000.0), None), // null key, above range; null status OK
      (Some(3L), None, Some("F")) // null range value OK
    ).toDF("k", "v", "s")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Quality.expectations(df, Seq(
        Quality.NotNull("k"),
        Quality.InRange("v", 0.0, 1000.0),
        Quality.AcceptedValues("s", Seq("O", "F")),
        Quality.Unique(Seq("k")),
        Quality.ForeignKey("k", parent, "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null:k" -> 1L,
      "in_range:v" -> 2L,
      "accepted_values:s" -> 1L,
      "unique:k" -> 1L, // two rows with k=1 -> 1 extra
      "foreign_key:k" -> 1L // k=3 has no parent; nulls are not violations
    ), got.toString)
  }

  test("expectations: clean table reports zero violations per check") {
    val df = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val got = Quality.expectations(df, Seq(
        Quality.NotNull("k"), Quality.Unique(Seq("k"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L), got.toString)
  }

  test("diffSnapshots: added/removed/changed/unchanged, null-safe compare") {
    val before = Seq((1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val after = Seq((2L, Some("B")), (3L, Option.empty[String]), (4L, Some("d")))
      .toDF("k", "v")
    val got = Quality.diffSnapshots(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "added"), got.toString)
  }

  test("diffSnapshots rejects mismatched non-key schemas") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Quality.diffSnapshots(a, b, Seq("k"))
    }
  }
}

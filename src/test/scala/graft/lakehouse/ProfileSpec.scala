package graft.lakehouse

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profileTable: one row per column with null/distinct/min/max") {
    val df = Seq(
      (1, Some("b"), 2.5),
      (10, None, 2.5),
      (3, Some("a"), 9.0)).toDF("k", "s", "v")
    val prof = Profile.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("k", "s", "v"))
    val s = prof("s")
    assert(s.getLong(1) == 3 && s.getLong(2) == 2) // rows, non-null
    assert(s.getLong(3) == 2)                      // distinct (nulls excluded)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    val v = prof("v")
    assert(v.getLong(3) == 2 && v.getString(4) == "2.5" && v.getString(5) == "9.0")
    // TYPED extremes: int max is 10 (numeric order), not "3" (lexicographic)
    val k = prof("k")
    assert(k.getString(4) == "1" && k.getString(5) == "10")
  }

  test("profileTable: typed ordering for dates/timestamps/bools") {
    val df = Seq(
      (java.sql.Date.valueOf("2024-01-09"), java.sql.Timestamp.valueOf("2024-01-09 10:00:00"), false),
      (java.sql.Date.valueOf("2024-01-10"), java.sql.Timestamp.valueOf("2024-01-10 09:00:00"), true))
      .toDF("d", "ts", "b")
    val prof = Profile.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof("d").getString(5) == "2024-01-10")
    assert(prof("ts").getString(5).startsWith("2024-01-10"))
    assert(prof("b").getString(4) == "false" && prof("b").getString(5) == "true")
  }

  test("profileTable plan is a single scan (one Expand, no self-joins)") {
    val df = spark.read.parquet(s"$sf0001/nation.parquet")
    val p = Profile.profileTable(df).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).size <= 2, p) // AQE may print twice
  }
}

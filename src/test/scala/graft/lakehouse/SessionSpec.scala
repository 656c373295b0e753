package graft.lakehouse

class SessionSpec extends SparkSuite {

  test("sparkSession: getOrCreate no-ops onto the live session, registers fns") {
    val s = Session.sparkSession()
    assert(s eq spark) // getOrCreate over the suite session
    // UDFs + native fns registered and callable from SQL
    assert(s.sql("SELECT custom_initcap('JOHN doe') v").head().getString(0) == "John Doe")
    assert(s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) v")
      .head().getDouble(0) == 11.0)
    // extension-tier kernels reachable from SQL too
    assert(s.sql("SELECT graft_lang_id('the quick brown fox and the dog') v")
      .head().getString(0) == "en")
    assert(s.sql("SELECT graft_simhash64('a b c') v").head().getLong(0)
      == graft.lakehouse.ext.Dedup.simHash64("a b c"))
    assert(s.sql("SELECT size(graft_winnow_fp('some document text to " +
      "fingerprint with enough length')) v").head().getInt(0) > 0)
  }

  test("extractActualError walks to the root cause") {
    val nested = new RuntimeException("outer",
      new IllegalStateException("middle", new java.io.IOException("root cause")))
    assert(Session.extractActualError(nested) == "root cause")
    Session.displayException(nested, reraise = false) // logs, no throw
    intercept[RuntimeException](Session.displayException(nested))
  }

  test("display handles DataFrames and plain values") {
    import spark.implicits._
    Session.display(Seq((1, "a")).toDF("k", "v"))
    Session.display(Map("x" -> 1))
    Session.display("plain")
  }
}

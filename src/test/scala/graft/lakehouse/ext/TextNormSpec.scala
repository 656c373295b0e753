package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import graft.lakehouse.functions.TextNormFunctions._
import org.apache.spark.sql.functions._

class TextNormSpec extends SparkSuite {
  import spark.implicits._

  private val composedE = "\u00e9"        // é, single code point
  private val decomposedE = "e\u0301"     // e + COMBINING ACUTE ACCENT

  test("graft_nfc composes decomposed sequences; identity on ASCII") {
    val df = Seq(
      s"caf$decomposedE",
      "plain ascii",
      s"caf$composedE"
    ).toDF("t")
    val out = df.select(graft_nfc(col("t"))).collect().map(_.getString(0))
    assert(out(0) == s"caf$composedE")
    assert(out(1) == "plain ascii")
    assert(out(2) == s"caf$composedE")
  }

  test("graft_nfkc folds compatibility characters NFC leaves alone") {
    val df = Seq("\ufb01le \u2460").toDF("t") // fi-ligature, circled one
    val nfc = df.select(graft_nfc(col("t"))).head().getString(0)
    val nfkc = df.select(graft_nfkc(col("t"))).head().getString(0)
    assert(nfc == "\ufb01le \u2460")
    assert(nfkc == "file 1")
  }

  test("null text stays null; invalid form fails at analysis time") {
    val df = Seq[Option[String]](None, Some("x")).toDF("t")
    val out = df.select(graft_nfc(col("t"))).collect()
    assert(out(0).isNullAt(0) && out(1).getString(0) == "x")
    val e = intercept[Exception] {
      df.select(graft_normalize(col("t"), "NOPE")).collect()
    }
    assert(e.getMessage.contains("NFC") || e.getMessage.contains("form"))
  }

  test("normalizer compiles under CODEGEN_ONLY over non-nullable input " +
      "(no silent interpreter fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = spark.range(4)
        .select(concat(lit(decomposedE), col("id").cast("string")).as("t"))
        .select(graft_nfc(col("t")).as("n"))
        .agg(count(when(col("n").startsWith(composedE), 1)))
        .head().getLong(0)
      assert(got == 4L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("normalizeDocuments: audit columns track composition") {
    val df = Seq((1L, s"n${decomposedE}e"), (2L, "abc")).toDF("id", "t")
    val out = TextNorm.normalizeDocuments(df, "id", "t").orderBy("id").collect()
    assert(out(0).getString(1) == s"n${composedE}e")
    assert(out(0).getLong(2) == 4L && out(0).getLong(3) == 3L)
    assert(out(0).getBoolean(4))
    assert(out(1).getString(1) == "abc" && !out(1).getBoolean(4))
  }

  test("scriptProfile: counts, dominant script, mixed flag") {
    val cyrPrivet = "\u043f\u0440\u0438\u0432\u0435\u0442"
    val cyrMir = "\u043c\u0438\u0440"
    val han = "\u6f22\u5b57"
    val df = Seq(
      (1L, "hello there"),
      (2L, s"$cyrPrivet $cyrMir"),
      (3L, s"mixed ${cyrPrivet.take(4)} 12"),
      (4L, ""),
      (5L, s"$han here")
    ).toDF("id", "t")
    val out = TextNorm.scriptProfile(df, "id", "t").orderBy("id").collect()
    assert(out(0).getAs[Long]("latin_n") == 10L &&
      out(0).getAs[String]("dominant_script") == "latin" &&
      !out(0).getAs[Boolean]("mixed_script"))
    assert(out(1).getAs[Long]("cyrillic_n") == 9L &&
      out(1).getAs[String]("dominant_script") == "cyrillic")
    assert(out(2).getAs[Long]("latin_n") == 5L &&
      out(2).getAs[Long]("cyrillic_n") == 4L &&
      out(2).getAs[Long]("digit_n") == 2L &&
      out(2).getAs[Boolean]("mixed_script"))
    assert(out(3).getAs[String]("dominant_script") == "none")
    assert(out(4).getAs[Long]("han_n") == 2L &&
      out(4).getAs[Boolean]("mixed_script"))
  }

  test("mojibakeAudit: injected damage is counted per class, clean text " +
    "contributes zeros") {
    import spark.implicits._
    val docs = Seq(
      "clean text",
      "bad \uFFFD char and another \uFFFD",
      "smart quote gone \u00E2\u20AC\u0153wrong",
      "latin1 caf\u00C3\u00A9 artifact",
      "non\u00A0breaking\u00A0spaces",
      "ctrl\u0007bell").toDF("text")
    val got = TextNorm.mojibakeAudit(docs, "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("replacement_char") == (1L, 2L))
    assert(got("latin1_utf8_artifact") == (2L, 2L))
    assert(got("nbsp") == (1L, 2L))
    assert(got("c0_controls") == (1L, 1L))
    assert(got("c1_controls") == (0L, 0L))
  }
}

package graft

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.types.{TimestampType, BinaryType, ArrayType, FloatType}

/** Fixture-drift tripwire. The driver regenerates /root/testdata between
  * rounds and has already changed a physical type once (round 4: events.ts
  * went TIMESTAMP(NANOS) → TIMESTAMP(MICROS,ntz), silently breaking every
  * events consumer). This spec loads each fixture through the SAME path the
  * query registry uses (QFixtures) and asserts the resolved schema contract
  * the operators rely on — so a regenerated fixture with a new encoding
  * fails here with a one-line diagnosis naming the file and resolved type,
  * instead of as 17 scoreboard holes.
  */
class FixtureSchemaSpec extends SparkSuite {
  private val tpch =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  test("all TPC-H fixture tables load via QFixtures.t and are non-empty") {
    val problems = tpch.flatMap { name =>
      try {
        val df = QFixtures.t(spark, sf0001, name)
        if (df.limit(1).count() == 0L) Some(s"$name: loads but is EMPTY") else None
      } catch { case e: Throwable =>
        Some(s"$name: failed to load — ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("events loads via QFixtures.ev with ts resolved to TimestampType, any fixture encoding") {
    val ev = QFixtures.ev(spark, sf0001)
    val tsType = ev.schema("ts").dataType
    assert(tsType == TimestampType,
      s"events.ts resolved as $tsType, not TimestampType — " +
        "fixture regenerated with an encoding readParquetNanoTs doesn't cover?")
    // values must be sane epoch range (not nanos mis-read as micros, which
    // would land in year ~56k, nor micros div'd again landing near 1970)
    val r = ev.selectExpr("min(year(ts)) as lo", "max(year(ts)) as hi").head()
    val (lo, hi) = (r.getInt(0), r.getInt(1))
    assert(lo >= 1990 && hi <= 2100,
      s"events.ts year range [$lo,$hi] out of sanity bounds — unit mix-up in the ts loader?")
  }

  test("documents fixture has the text columns the text operators assume") {
    val df = QFixtures.t(spark, sf0001, "documents")
    val cols = df.columns.toSet
    val needed = Seq("doc_id", "text").filterNot(cols)
    assert(needed.isEmpty, s"documents.parquet missing ${needed.mkString(",")}; has ${cols.toSeq.sorted}")
    // blob is optional (current fixtures synthesize blobs from text); if the
    // driver ever adds one, it must be binary for the multimodal ops
    if (cols("blob"))
      assert(df.schema("blob").dataType == BinaryType,
        s"documents.blob resolved as ${df.schema("blob").dataType}, multimodal ops expect binary")
  }

  test("embeddings fixture has a float-array embedding column") {
    val df = QFixtures.t(spark, sf0001, "embeddings")
    val embType = df.schema("embedding").dataType
    assert(embType.isInstanceOf[ArrayType],
      s"embeddings.embedding resolved as $embType, ANN ops expect array<float|double>")
  }
}

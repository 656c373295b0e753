package graft.lakehouse.functions

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  lazy val df = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (Array(1.0, 0.0), Array(0.0, 1.0)),
    (Array(2.0, 0.0), Array(2.0, 0.0))).toDF("a", "b")

  test("graft_dot matches hand computation") {
    val out = df.select(VectorFunctions.graft_dot(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(32.0, 0.0, 4.0))
  }

  test("graft_cosine matches hand computation, orthogonal=0, parallel=1") {
    val out = df.select(VectorFunctions.graft_cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-15)
    assert(out(1) == 0.0)
    assert(out(2) == 1.0)
  }

  test("codegen and interpreted paths agree (HOF formulation as witness)") {
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)).collect().map(_.getDouble(0))
    val native = df.select(VectorFunctions.graft_dot(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(hof.toSeq == native.toSeq)
  }

  test("null input yields null (nullIntolerant)") {
    val withNull = Seq(
      (Some(Array(1.0)), None: Option[Array[Double]])).toDF("a", "b")
    val out = withNull.select(VectorFunctions.graft_dot(col("a"), col("b"))).head()
    assert(out.isNullAt(0))
  }

  test("SQL registration via function registry and extensions") {
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("vec_test")
    val out = spark.sql(
      "SELECT graft_cosine(a, b) c, graft_dot(a, b) d FROM vec_test").collect()
    assert(out.length == 3)
    assert(out(2).getDouble(0) == 1.0 && out(2).getDouble(1) == 4.0)
  }

  test("float arrays work after cast (fixture embedding shape)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(5)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val self = emb.select(VectorFunctions.graft_cosine(col("v"), col("v")))
      .collect().map(_.getDouble(0))
    self.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }
}

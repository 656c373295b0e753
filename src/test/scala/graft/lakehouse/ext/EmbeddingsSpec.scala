package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSuite {
  import spark.implicits._

  test("l2Kernel: unit norm, zero-vector passthrough, order-stable sum") {
    val v = Embeddings.l2Kernel(Seq(3.0, 4.0))
    assert(math.abs(v(0) - 0.6) < 1e-15 && math.abs(v(1) - 0.8) < 1e-15)
    assert(Embeddings.l2Kernel(Seq(0.0, 0.0)).toSeq == Seq(0.0, 0.0))
    val n = Embeddings.l2Kernel(Seq(1.0, 1.0, 1.0))
    assert(math.abs(n.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("quantizeKernel: symmetric int8, half-away-from-zero rounding") {
    val (scale, q) = Embeddings.quantizeKernel(Seq(1.0, -0.5, 0.25, 0.0))
    assert(scale == 1.0 / 127.0)
    assert(q.toSeq == Seq(127, -64, 32, 0)) // -63.5 -> -64 (away from zero)
    val (s0, q0) = Embeddings.quantizeKernel(Seq(0.0, 0.0))
    assert(s0 == 0.0 && q0.toSeq == Seq(0, 0))
  }

  test("quantize roundtrip error is bounded by scale/2") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val out = Embeddings.withInt8Quantized(emb, "embedding")
      .select($"vec_id", $"q8_scale",
        transform($"embedding", x => x.cast("double")).as("v"), $"embedding_q8")
      .collect()
    out.foreach { r =>
      val scale = r.getDouble(1)
      val v = r.getSeq[Double](2)
      val q = r.getSeq[Int](3)
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi * scale) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: $x vs ${qi * scale}")
      }
    }
  }

  test("withL2Normalized produces unit vectors on fixture data") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val norms = Embeddings.withL2Normalized(emb, "embedding")
      .select(aggregate($"embedding_norm", lit(0.0), (a, x) => a + x * x))
      .collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9, n.toString))
  }
}

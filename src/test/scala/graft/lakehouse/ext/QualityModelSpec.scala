package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** Model-based quality filtering: the trainer must actually learn, learn
  * DETERMINISTICALLY (fixed-point gradients ⇒ partitioning-independent
  * weights), and the scoring kernel must agree with an independent
  * DataFrame-ops formulation of the same feature definition. */
class QualityModelSpec extends SparkSuite {
  import spark.implicits._

  private def synthetic(n: Int): org.apache.spark.sql.DataFrame = {
    // separable corpus: "good" docs draw from one vocab, "bad" from
    // another, with shared filler words so the model has noise to ignore
    val goodV = Vector("clear", "concise", "informative", "sourced", "novel")
    val badV = Vector("spam", "click", "bait", "junk", "scam")
    val filler = Vector("the", "a", "of", "and", "to")
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val label = i % 2
      val v = if (label == 1) goodV else badV
      val words = (0 until 20).map { _ =>
        if (rnd.nextDouble() < 0.4) filler(rnd.nextInt(filler.size))
        else v(rnd.nextInt(v.size))
      }
      (i.toLong, words.mkString(" "), label.toDouble)
    }.toDF("id", "text", "label")
  }

  test("train learns a separable corpus (accuracy >= 0.95)") {
    val df = synthetic(400)
    val m = QualityModel.train(df, "text", "label",
      dim = 256, iters = 40, lr = 4.0)
    val scored = QualityModel.score(df, "id", "text", m)
      .join(df.select("id", "label"), "id")
    val acc = scored
      .select(avg(((col("quality_prob") >= 0.5).cast("int") ===
        col("label").cast("int")).cast("double")))
      .head().getDouble(0)
    assert(acc >= 0.95, s"train accuracy $acc")
  }

  test("training is bit-deterministic under repartitioning " +
      "(fixed-point gradient accumulation)") {
    val df = synthetic(200)
    val m1 = QualityModel.train(df, "text", "label",
      dim = 128, iters = 15, lr = 2.0)
    val m2 = QualityModel.train(df.repartition(7), "text", "label",
      dim = 128, iters = 15, lr = 2.0)
    assert(m1.weights.sameElements(m2.weights),
      "weights diverged across partitionings")
  }

  test("portable scorer agrees with an independent DataFrame-ops " +
      "formulation of the feature path") {
    val docs = Seq(
      (1L, "Fast queries JOIN small tables; fast queries win!"),
      (2L, "slow scans... slow scans, slow scans"),
      (3L, ""), // no grams: logit = bias
      (4L, "a"),
      (5L, "x1 y2 x1 y2 x1")).toDF("doc_id", "text")
    val dim = 64
    val got = QualityModel.scoreLogitsPortable(docs, "doc_id", "text",
      dim = dim, bias = 7L).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq

    // independent formulation: explode unigram+bigram grams with SQL
    // functions, hash with sha2, apply the weight formula, aggregate
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "")
        .as("ts"))
    val grams = toks.select(col("doc_id"), explode(col("ts")).as("g"))
      .unionAll(toks
        .filter(size(col("ts")) > 1)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> concat(ts[i], '_', ts[i + 1]))")).as("g")))
    val scored = grams
      .withColumn("j", expr(
        s"cast(conv(substring(sha2(g, 256), 1, 15), 16, 10) as bigint) % $dim"))
      .withColumn("w", expr(
        "(j * 2654435761L) % 2000003L % 1001L - 500L"))
      .groupBy("doc_id").agg(sum("w").as("s"))
    val expected = docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        (lit(7L) + coalesce(col("s"), lit(0L))).as("logit_fp"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(got.find(_._1 == 3L).get._2 == 7L, "empty text scores the bias")
  }

  test("score tolerates null text (bias-only) and empty corpora") {
    val docs = Seq((1L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val m = QualityModel.Model(16, new Array[Long](17))
    val r = QualityModel.score(docs, "id", "text", m).collect()
    assert(r.length == 1 && r(0).getDouble(2) == 0.5,
      "zero weights: prob = sigmoid(0) = 0.5")
  }
}

package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the "train a small classifier, score
  * the corpus, keep what scores well" pipeline stage (fastText-style
  * hashed bag-of-n-grams linear model; the DCLM / FineWeb-Edu recipe).
  * Not in the reference (its surface is relational, `common.py`); this is
  * an extension-tier operator alongside DSIR (`ext/Dsir.scala`) — DSIR
  * reweights by generative importance ratios, this trains a
  * DISCRIMINATIVE model from labeled examples.
  *
  * 100 TB design:
  *  - training runs on a seeded bounded sample (`maxFitRows`, the PQ /
  *    BPE precedent) whose hashed features are computed once and
  *    persisted — iterations never re-read text;
  *  - each iteration moves one `dim+1`-long gradient array through
  *    `treeAggregate` (KB-sized, independent of corpus size) and the
  *    model itself broadcasts — there is no parameter shuffle;
  *  - scoring is a per-row compiled kernel over broadcast weights: zero
  *    shuffle, embarrassingly parallel.
  *
  * Determinism: gradients accumulate as FIXED-POINT LONGS (each row's
  * contribution is rounded once, then summed with exact integer
  * addition), so the trained weights are bit-identical under any
  * partitioning or reduction order — the property float accumulation
  * cannot give (the anomaly/Welch operators use the same trick for
  * hash-verifiable scores).
  *
  * Feature definition (shared by trainer, scorer, and the SQL oracle of
  * the portable twin): ASCII token runs `[a-z0-9]+` of the lowercased
  * text; grams = the tokens plus `_`-joined adjacent bigrams
  * (occurrence-preserving); feature index = 60-bit sha-256 prefix of the
  * gram (same primitive as [[Dedup.portableSimHash]]) mod `dim`.
  */
object QualityModel {

  /** Trained model: fixed-point weights (value = weights(j) / Scale),
    * index `dim` holds the bias. */
  final case class Model(dim: Int, weights: Array[Long]) {
    def bias: Long = weights(dim)
  }

  /** Fixed-point scale for weights and gradient accumulation: 1e6 keeps
    * six decimal places and leaves ~43 bits of headroom for exact long
    * sums over billions of rows. */
  val Scale: Long = 1000000L

  private val sha256Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("SHA-256")
    }

  private[ext] def asciiTokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val lower = text.toLowerCase
    var i = 0
    val n = lower.length
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = lower.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        out += lower.substring(i, j)
        i = j
      } else i += 1
    }
    out.toArray
  }

  /** 60-bit sha-256 prefix of the gram, non-negative (the value DuckDB
    * computes as ('0x' || substring(sha256(g),1,15))::UBIGINT). */
  private[ext] def gramHash60(gram: String,
      memo: java.util.HashMap[String, java.lang.Long]): Long = {
    var h = memo.get(gram)
    if (h == null) {
      val d = sha256Local.get().digest(
        gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      h = java.lang.Long.valueOf(v >>> 4)
      if (memo.size() > 256 * 1024) memo.clear()
      memo.put(gram, h)
    }
    h.longValue()
  }

  /** Per-document hashed gram counts: index → occurrence count.
    * Unigrams plus adjacent `_`-joined bigrams. */
  private[ext] def gramCounts(text: String, dim: Int,
      memo: java.util.HashMap[String, java.lang.Long]):
      java.util.HashMap[Integer, Integer] = {
    val toks = asciiTokens(text)
    val counts = new java.util.HashMap[Integer, Integer]()
    def add(g: String): Unit = {
      val idx = Integer.valueOf((gramHash60(g, memo) % dim).toInt)
      val c = counts.get(idx)
      counts.put(idx, if (c == null) 1 else c + 1)
    }
    var i = 0
    while (i < toks.length) {
      add(toks(i))
      if (i + 1 < toks.length) add(toks(i) + "_" + toks(i + 1))
      i += 1
    }
    counts
  }

  /** Sparse features for training: sorted index/count arrays plus the
    * total gram count (features are count/total so document length does
    * not dominate — fastText's mean-of-embeddings analog). */
  private[ext] case class FeatRow(label: Double, idx: Array[Int],
      cnt: Array[Int], total: Int)

  private def featurize(text: String, label: Double, dim: Int,
      memo: java.util.HashMap[String, java.lang.Long]): FeatRow = {
    val m = gramCounts(text, dim, memo)
    val ks = new Array[Int](m.size)
    val it = m.keySet().iterator()
    var i = 0
    while (it.hasNext) { ks(i) = it.next(); i += 1 }
    java.util.Arrays.sort(ks)
    val cs = new Array[Int](ks.length)
    var tot = 0
    i = 0
    while (i < ks.length) {
      cs(i) = m.get(ks(i)); tot += cs(i); i += 1
    }
    FeatRow(label, ks, cs, tot)
  }

  private def sigmoid(m: Double): Double = 1.0 / (1.0 + math.exp(-m))

  /** Train a logistic-regression quality classifier on (text, label∈{0,1})
    * rows. Full-batch gradient descent over a seeded sample of at most
    * `maxFitRows` rows; features hashed once and persisted; gradient
    * accumulation fixed-point exact (bit-identical weights under any
    * partitioning). `l2` is applied per step against the current weights
    * (also in fixed point), keeping collisions from blowing up weights on
    * tiny dims. */
  def train(df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1 << 12, iters: Int = 50, lr: Double = 2.0,
      l2: Double = 0.0, maxFitRows: Int = 100000, seed: Long = 42L): Model = {
    require(dim > 0 && (dim & (dim - 1)) == 0, "dim must be a power of two")
    val spark = df.sparkSession
    import spark.implicits._
    val n0 = df.count()
    val sampled =
      if (n0 <= maxFitRows) df
      else df.sample(withReplacement = false,
        math.min(1.0, maxFitRows.toDouble / n0 * 1.05), seed)
    val d = dim
    val feats: Dataset[FeatRow] = sampled
      .select(col(textCol).cast("string"), col(labelCol).cast("double"))
      .as[(String, Double)]
      .mapPartitions { rows =>
        val memo = new java.util.HashMap[String, java.lang.Long]()
        rows.map { case (text, label) => featurize(text, label, d, memo) }
      }
    feats.persist()
    val n = feats.count().toDouble
    val w = new Array[Long](dim + 1)
    var it = 0
    while (it < iters) {
      val bw = spark.sparkContext.broadcast(w.clone())
      val grad = feats.rdd.treeAggregate(new Array[Long](dim + 1))(
        seqOp = (acc, row) => {
          val wv = bw.value
          var m = wv(d).toDouble / Scale
          var i = 0
          while (i < row.idx.length) {
            m += (row.cnt(i).toDouble / row.total) *
              (wv(row.idx(i)).toDouble / Scale)
            i += 1
          }
          val err = sigmoid(m) - row.label
          i = 0
          while (i < row.idx.length) {
            acc(row.idx(i)) += math.round(
              err * (row.cnt(i).toDouble / row.total) * Scale)
            i += 1
          }
          acc(d) += math.round(err * Scale)
          acc
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
      var j = 0
      while (j <= dim) {
        val g = grad(j).toDouble / n / Scale + l2 * (w(j).toDouble / Scale)
        w(j) -= math.round(lr * g * Scale)
        j += 1
      }
      bw.destroy()
      it += 1
    }
    feats.unpersist()
    Model(dim, w)
  }

  /** Score a corpus under a trained model: per-row compiled kernel over
    * the broadcast weights — zero shuffle. Output columns: `logit`
    * (double) and `quality_prob` (sigmoid). Null/empty text scores the
    * bias alone. */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val d = model.dim
    val wts = model.weights
    val kernel = new (String => Double) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, java.lang.Long]()
      override def apply(text: String): Double = {
        val m = gramCounts(text, d, memo)
        var tot = 0
        val vit = m.values().iterator()
        while (vit.hasNext) tot += vit.next()
        var s = wts(d).toDouble / Scale
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          s += (e.getValue.toDouble / tot) *
            (wts(e.getKey.intValue()).toDouble / Scale)
        }
        s
      }
    }
    val u = udf(kernel)
    df.select(col(idCol), u(col(textCol)).as("logit"))
      .withColumn("quality_prob",
        lit(1.0) / (lit(1.0) + exp(-col("logit"))))
  }

  /** Portable fixed-weight scorer — the cross-engine verification harness
    * for the shared tokenize → gram → sha-hash → accumulate path: raw
    * INTEGER gram counts against weights given by a pure integer formula
    * `w(j) = (j * 2654435761) mod 2000003 mod 1001 − 500`, so the logit is
    * an exact BIGINT any engine reproduces bit-for-bit (the SQL oracle of
    * q191 replays tokens, bigrams, sha-256 indices, the weight formula,
    * and the sum). */
  def scoreLogitsPortable(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 64, bias: Long = 7L): DataFrame = {
    val d = dim
    val kernel = new (String => Long) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, java.lang.Long]()
      override def apply(text: String): Long = {
        val m = gramCounts(text, d, memo)
        var s = bias
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val j = e.getKey.longValue()
          val w = ((j * 2654435761L) % 2000003L) % 1001L - 500L
          s += e.getValue.longValue() * w
        }
        s
      }
    }
    val u = udf(kernel)
    df.select(col(idCol), u(col(textCol)).as("logit_fp"))
  }
}

package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column preparation operators for training-data pipelines:
  * L2 normalization (cosine-ready vectors) and symmetric int8 quantization
  * (4× smaller embedding tables; the standard serving/index format).
  *
  * Per-row kernels are compiled Scala UDFs, not higher-order-function
  * lambdas — Spark evaluates HOF lambdas interpreted per element, which on a
  * 64-dim × billions-of-rows corpus is the difference between a JIT'd loop
  * and an expression-tree walk per float (same rationale as the MinHash
  * kernel, Dedup.scala). Nothing here shuffles: both operators are
  * narrow per-row transforms that ride whatever partitioning the input has.
  */
object Embeddings {

  /** x / ||x||₂, sequential left-to-right sum of squares (matches DuckDB's
    * list_sum evaluation order — the oracle compares values, so summation
    * order must be identical). Zero vectors pass through unchanged. */
  private[ext] def l2Kernel(v: Seq[Double]): Array[Double] = {
    val n = v.length
    val a = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v(i); a(i) = x; ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm == 0.0) return a
    var j = 0
    while (j < n) { a(j) /= nrm; j += 1 }
    a
  }

  /** Symmetric per-vector int8 quantization: scale = max|x| / 127,
    * q_i = round_half_away_from_zero(x_i / scale) ∈ [-127, 127].
    * Rounding is spelled out explicitly because JVM Math.round is
    * half-toward-positive-infinity while SQL engines round half away from
    * zero — the one detail that would silently desync the oracle. */
  private[ext] def quantizeKernel(v: Seq[Double]): (Double, Array[Int]) = {
    val n = v.length
    var mx = 0.0
    var i = 0
    while (i < n) { val ax = math.abs(v(i)); if (ax > mx) mx = ax; i += 1 }
    val q = new Array[Int](n)
    if (mx == 0.0) return (0.0, q)
    var j = 0
    while (j < n) {
      val y = v(j) * 127.0 / mx
      q(j) = (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toInt
      j += 1
    }
    (mx / 127.0, q)
  }

  private val l2Udf = udf((v: Seq[Double]) => l2Kernel(v))
  private val quantUdf = udf((v: Seq[Double]) => quantizeKernel(v))

  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** `outCol` = L2-normalized copy of `vecCol` (array<double>). */
  def withL2Normalized(df: DataFrame, vecCol: String,
      outCol: String = "embedding_norm"): DataFrame =
    df.withColumn(outCol, l2Udf(asDouble(col(vecCol))))

  /** Adds `scaleCol` (double) and `qCol` (array<int>, values in [-127,127])
    * — dequantize with x ≈ q * scale. */
  def withInt8Quantized(df: DataFrame, vecCol: String,
      qCol: String = "embedding_q8", scaleCol: String = "q8_scale"): DataFrame = {
    val packed = quantUdf(asDouble(col(vecCol)))
    df.withColumn("__q", packed)
      .withColumn(scaleCol, col("__q._1"))
      .withColumn(qCol, col("__q._2"))
      .drop("__q")
  }

  // ---- fixed-point Johnson–Lindenstrauss random projection ----------------

  /** Sign-matrix entry for row `i`, input component `j0` (both 0-based):
    * parity of the 60-bit sha-256 prefix of "i#j0" → ±1. The SAME hash
    * recipe as the portable sketches (Sketches.cmsHash), so any engine
    * derives the identical matrix from (i, j0) alone — nothing is stored
    * or shipped. */
  private[ext] def jlSign(i: Int, j0: Int): Int = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"$i#$j0".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.take(15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  /** Fixed-point Johnson–Lindenstrauss projection to `outDim` dimensions
    * (Achlioptas JCSS'03's database-friendly ±1 matrix, quantized):
    * components floor-quantize to integers at `scale`, then each output
    * coordinate is an exact integer signed sum
    * `p_i = Σ_j sign(i,j)·floor(v_j·scale)` under the sha-derived sign
    * matrix — E⟨Pa,Pb⟩ = outDim·⟨qa,qb⟩, the JL dot-product guarantee,
    * with every arithmetic step integral and engine-portable (float JL
    * is an unordered IEEE sum twice over). The standard compression step
    * before ANN indexing or clustering when 64-dim embeddings are still
    * too wide for a billion-row index.
    *
    * 100 TB shape: a pure per-row kernel — zero shuffle, rides the input
    * partitioning; the sign matrix is outDim × dim ints rebuilt from the
    * hash in each task closure (never shipped, never collected). Vectors
    * shorter than `dim` project as if zero-padded; extra components are
    * ignored. Output: `outCol` = array<long> of length `outDim`. */
  def withJlProjection(df: DataFrame, vecCol: String, outDim: Int, dim: Int,
      scale: Long = 1000000L, outCol: String = "embedding_jl"): DataFrame = {
    require(outDim >= 1 && dim >= 1 && scale >= 1, "need positive dims/scale")
    val signs = Array.tabulate(outDim, dim)(jlSign)
    val projUdf = udf((v: Seq[Double]) => {
      val n = math.min(v.length, dim)
      val out = new Array[Long](outDim)
      var j = 0
      while (j < n) {
        val q = math.floor(v(j) * scale).toLong
        var i = 0
        while (i < outDim) { out(i) += signs(i)(j) * q; i += 1 }
        j += 1
      }
      out
    })
    df.withColumn(outCol, projUdf(asDouble(col(vecCol))))
  }

  /** Fixed-point mean pooling of grouped embeddings — the chunk→document
    * (or doc→label-centroid) aggregation of an embedding pipeline, in
    * ENGINE-PORTABLE arithmetic: each vector quantizes to
    * `floor(x·scale)` integers once, the group mean is per-dimension
    * `sum div n` (exact integer sums; the float mean is
    * partition-order-dependent, this is not), and any engine replays
    * the pooled vectors bit-for-bit. Returns one row per (group,
    * dimension): (group, pos, v, n) — exploded rather than re-packed so
    * downstream joins, comparisons, and cross-engine checks work on
    * scalars.
    *
    * Scale shape: quantization is a per-row kernel; the (group, pos)
    * sum partial-aggregates so only |groups|·dim cells per partition
    * cross the exchange (the k-means-update shape) — the vectors
    * themselves never shuffle. */
  def meanPoolFixedPoint(df: DataFrame, groupCol: String, vecCol: String,
      scale: Long = 1024L): DataFrame = {
    require(scale >= 1, "meanPoolFixedPoint needs scale >= 1")
    // null-safe: the optimizer may evaluate the kernel before the
    // isNotNull filter (subexpression elimination into the predicate)
    val qUdf = udf((v: Seq[Double]) =>
      if (v == null) null
      else {
        val o = new Array[Long](v.length)
        var i = 0
        while (i < v.length) { o(i) = math.floor(v(i) * scale).toLong; i += 1 }
        o
      })
    df.where(col(vecCol).isNotNull)
      .select(col(groupCol).as("group"), qUdf(asDouble(col(vecCol))).as("q"))
      .select(col("group"), posexplode(col("q")).as(Seq("pos", "qv")))
      .groupBy("group", "pos")
      .agg(sum("qv").as("s"), count(lit(1)).as("n"))
      .select(col("group"), col("pos"),
        expr("s div n").as("v"), col("n"))
  }

  /** Dominant right singular vector of the quantized embedding matrix by
    * power iteration — the matrix-free first principal direction (of the
    * UNCENTERED matrix; subtract [[meanPoolFixedPoint]]'s mean first for
    * covariance PCA). Engine-portable by construction: vectors quantize
    * to integers, each round computes Av (per-row integer dot), then
    * AᵀAv (one per-dimension exact-decimal aggregation), then
    * renormalizes to the integer scale through one fixed IEEE op
    * sequence (exact-decimal Σs² → double → sqrt → floor). The explicit
    * round count is the replay contract (the pageRank pattern) — any
    * engine reproduces every round bit-for-bit.
    *
    * Scale shape: one O(n·d) pass per round (no joins — av rides along
    * the row into the posexplode), d-row aggregation output, an O(d)
    * driver fold for the normalization (bounded, like the BPE merge
    * dict). The input projection is persisted across rounds. */
  def powerIterationTopComponent(df: DataFrame, vecCol: String,
      iterations: Int = 2, scale: Long = 1024L): DataFrame = {
    require(iterations >= 1 && iterations <= 8 && scale >= 1,
      "powerIterationTopComponent needs 1 <= iterations <= 8, scale >= 1")
    val spark = df.sparkSession
    val qUdf = udf((v: Seq[Double]) =>
      if (v == null) null
      else {
        val o = new Array[Long](v.length)
        var i = 0
        while (i < v.length) { o(i) = math.floor(v(i) * scale).toLong; i += 1 }
        o
      })
    val base = df.where(col(vecCol).isNotNull)
      .select(qUdf(asDouble(col(vecCol))).as("qv"))
      .persist()
    try {
      val dim = base.select(max(size(col("qv")))).head().getInt(0)
      var v: Array[Long] = Array.fill(dim)(scale)
      for (_ <- 1 to iterations) {
        val vExpr = array(v.map(lit(_)): _*)
        val s = base
          .withColumn("__v", vExpr)
          .withColumn("av", expr(
            "aggregate(zip_with(qv, __v, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .select(col("av"), posexplode(col("qv")).as(Seq("pos", "x")))
          .groupBy("pos")
          .agg(sum((col("x") * col("av")).cast("decimal(18,0)")).as("s"))
          .orderBy("pos")
          .collect()
          .map(r => r.getAs[java.math.BigDecimal]("s").toBigInteger)
        require(s.length == dim, "embedding dimensions must be uniform")
        // Σs² exactly, then one correctly-rounded double sqrt — the same
        // value any engine computes from the same integers
        val sumSq = s.foldLeft(java.math.BigInteger.ZERO)(
          (acc, x) => acc.add(x.multiply(x)))
        val norm = math.sqrt(new java.math.BigDecimal(sumSq).doubleValue())
        require(norm > 0.0, "zero matrix has no principal direction")
        v = s.map(sd => math.floor(scale.toDouble *
          new java.math.BigDecimal(sd).doubleValue() / norm).toLong)
      }
      import spark.implicits._
      v.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("pos", "component")
    } finally { base.unpersist(false) }
  }

  /** Class-separation diagnostic over a labeled embedding table: the
    * pairwise angular alignment of per-label centroid DIRECTIONS, in
    * engine-portable integer arithmetic (a high |alignment| between two
    * labels' centroids flags classes a linear probe can't tell apart —
    * the standard embedding-quality smoke test before spending GPU time
    * on the real eval).
    *
    * Cosine is scale-invariant, so the mean never needs dividing: each
    * label's direction is the integer SUM of its fixed-point-quantized
    * vectors (`floor(x·2^20)`, the q197/q200 portability trick), and the
    * signed squared cosine rides exact DECIMAL arithmetic:
    * `sign(dot) · (dot²·1000) div (‖a‖²·‖b‖²)` — every figure an
    * integer any engine reproduces bit-for-bit (no sqrt, no floats).
    *
    * Scale shape: quantization is a per-row kernel; the (label, dim)
    * sum partial-aggregates so only |labels|·dim cells per partition
    * cross the exchange (the k-means update shape) — the vectors
    * themselves never shuffle; the pairwise stage runs on a
    * |labels|-row frame, metadata-scale at any corpus size. The
    * DECIMAL(38) budget: the numerator squares the dot product, so it —
    * not the norms — binds first: |dot| must stay under 3e17 (then
    * dot²·1000 ≤ 9e37 < 10^38) and each squared norm under 1e18. With
    * per-dimension quantized sums bounded by B, dot ≤ dim·B², so at
    * dim 64 the real budget is B = Σ|x|·2^20 per dimension ≲ 7e7 per
    * label (≈ 70 quantized units per row across a million-row class).
    * Exceeding it RAISES (per-pair guard below) instead of silently
    * NULLing the alignment in non-ANSI mode; drop `scale` for bigger
    * classes. */
  def labelCentroidSeparation(df: DataFrame, vecCol: String,
      labelCol: String, scale: Long = 1L << 20): DataFrame = {
    val qUdf = udf((v: Seq[Double]) =>
      if (v == null) null
      else { val o = new Array[Long](v.length)
        var i = 0
        while (i < v.length) { o(i) = math.floor(v(i) * scale).toLong; i += 1 }
        o })
    val sums = df.where(col(vecCol).isNotNull)
      .select(col(labelCol).as("label"), qUdf(asDouble(col(vecCol))).as("q"))
      .select(col("label"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy("label", "d").agg(sum("v").as("s"))
      .groupBy("label").agg(
        sort_array(collect_list(struct(col("d"), col("s")))).as("sv"))
      .select(col("label"), expr("transform(sv, x -> x.s)").as("sv"))
    val n = df.where(col(vecCol).isNotNull)
      .groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n"))
    val lab = sums.join(n, "label")
    val a = lab.select(col("label").as("label_a"), col("sv").as("sa"),
      col("n").as("n_a"))
    val b = lab.select(col("label").as("label_b"), col("sv").as("sb"),
      col("n").as("n_b"))
    val dot = expr("aggregate(zip_with(sa, sb, (x, y) -> " +
      "cast(x as decimal(38,0)) * cast(y as decimal(38,0))), " +
      "cast(0 as decimal(38,0)), (acc, v) -> acc + v)")
    val na2 = expr("aggregate(sa, cast(0 as decimal(38,0)), " +
      "(acc, v) -> acc + cast(v as decimal(38,0)) * cast(v as decimal(38,0)))")
    val nb2 = expr("aggregate(sb, cast(0 as decimal(38,0)), " +
      "(acc, v) -> acc + cast(v as decimal(38,0)) * cast(v as decimal(38,0)))")
    // budget guard: past these bounds the decimal multiplies overflow
    // DECIMAL(38,0) and non-ANSI mode would silently NULL the alignment —
    // fail loudly instead (the check runs on the |labels|²-row frame only)
    val budgetOk = expr(
      "abs(__dot) <= cast(300000000000000000 as decimal(38,0)) and " +
        "__na2 <= cast(1000000000000000000 as decimal(38,0)) and " +
        "__nb2 <= cast(1000000000000000000 as decimal(38,0))")
    a.join(b, col("label_a") < col("label_b"))
      .withColumn("__dot", dot)
      .withColumn("__na2", na2)
      .withColumn("__nb2", nb2)
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("__dot").cast("long").as("dot"),
        when(!budgetOk, raise_error(lit(
            "labelCentroidSeparation DECIMAL(38) budget exceeded: " +
              "|dot| must stay under 3e17 and each squared norm under " +
              "1e18 — lower `scale` for this corpus")))
          .otherwise(when(col("__dot") < 0, -1L).otherwise(1L) *
            expr("cast((__dot * __dot * 1000) div (__na2 * __nb2) as bigint)"))
          .as("cos2_signed_permille"))
  }
  /** Corpus diversity diagnostic: the cosine-similarity histogram of a
    * DETERMINISTIC random pairing of the embedding corpus — mode
    * collapse / duplication shows up as mass piling into the top
    * buckets, a healthy diverse corpus concentrates near 0. Pairing is
    * the engine's deterministic-shuffle rule (rank by
    * `sha2(id '#' seed)`, consecutive ranks pair; the odd vector out
    * drops), so any engine reproduces the exact same pairs; the cosine
    * is the q33/q34 IEEE op chain (cast → multiply → sequential sum →
    * sqrt → divide — bit-identical across engines), bucketed at
    * `floor(cosine · 10)`. Null/empty vectors drop before pairing.
    *
    * 100 TB shape: one distributed sort + the zipWithIndex contiguous
    * rank (never a partition-less window), one join on pair id, ONE
    * ≤ 21-row aggregation out — O(n) total, sample-free and exact over
    * n/2 pairs. */
  def pairCosineHistogram(df: DataFrame, idCol: String, vecCol: String,
      seed: Long): DataFrame = {
    val key = sha2(concat_ws("#", col(idCol).cast("string"),
      lit(seed.toString)), 256)
    val vecs = df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).as("__id"),
        expr(s"transform(`$vecCol`, x -> cast(x as double))").as("__v"),
        key.as("__k"))
      .orderBy(col("__k"), col("__id"))
    val ranked = graft.lakehouse.Transform.addIndexColContiguous(
        vecs, "__r", indexStart = -1)
      .select(col("__id"), col("__v"),
        expr("__r div 2").as("__pair"), expr("__r % 2").as("__side"))
    // ONE pass: both sides of a pair meet in a single (pair)-keyed
    // aggregation (two filtered branches would re-run the sort+rank RDD
    // once per branch); the odd vector out has a null side and drops
    val cos = ranked.groupBy(col("__pair"))
      .agg(first(when(col("__side") === 0, col("__v")),
          ignoreNulls = true).as("__va"),
        first(when(col("__side") === 1, col("__v")),
          ignoreNulls = true).as("__vb"))
      .filter(col("__va").isNotNull && col("__vb").isNotNull)
      .select(expr(
        "aggregate(zip_with(__va, __vb, (x, y) -> x * y), 0d, " +
          "(acc, v) -> acc + v) / " +
          "(sqrt(aggregate(__va, 0d, (acc, x) -> acc + x * x)) * " +
          "sqrt(aggregate(__vb, 0d, (acc, x) -> acc + x * x)))")
        .as("__cos"))
    // round to 6dp BEFORE bucketing (the q33/q34 idiom): the raw cosine
    // is bit-identical across engines only for identical fold orders —
    // after round(6) a bucket flip would need a disagreement in the 6th
    // decimal, which the q33 oracle history rules out
    cos.select(expr("cast(floor(round(__cos, 6) * 10) as int)")
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Int8-quantization cosine-error histogram: over the SAME
    * deterministic random pairing as [[pairCosineHistogram]], the
    * absolute difference between each pair's float cosine and its
    * dequantized-int8 cosine, bucketed at 1e-4 — the one-page answer to
    * "does int8 storage change retrieval?" before a corpus commits to
    * 4× smaller vectors. Both cosines round to 6dp before differencing
    * (the q33/q278 cross-engine idiom); reconstruction is qᵢ·scale,
    * exactly the [[withInt8Quantized]] contract the oracle replays.
    * One pass, pair-keyed aggregation, 0-a-few output rows. */
  def quantizationErrorHistogram(df: DataFrame, idCol: String,
      vecCol: String, seed: Long): DataFrame = {
    val q = withInt8Quantized(
      df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0), vecCol)
    val key = sha2(concat_ws("#", col(idCol).cast("string"),
      lit(seed.toString)), 256)
    val vecs = q.select(col(idCol).as("__id"),
        expr(s"transform(`$vecCol`, x -> cast(x as double))").as("__v"),
        expr("transform(embedding_q8, q -> q * q8_scale)").as("__w"),
        key.as("__k"))
      .orderBy(col("__k"), col("__id"))
    val ranked = graft.lakehouse.Transform.addIndexColContiguous(
        vecs, "__r", indexStart = -1)
      .select(col("__v"), col("__w"),
        expr("__r div 2").as("__pair"), expr("__r % 2").as("__side"))
    def cosExpr(a: String, b: String): String =
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0d, " +
        s"(acc, v) -> acc + v) / " +
        s"(sqrt(aggregate($a, 0d, (acc, x) -> acc + x * x)) * " +
        s"sqrt(aggregate($b, 0d, (acc, x) -> acc + x * x)))"
    ranked.groupBy(col("__pair"))
      .agg(
        first(when(col("__side") === 0, col("__v")), ignoreNulls = true)
          .as("__va"),
        first(when(col("__side") === 1, col("__v")), ignoreNulls = true)
          .as("__vb"),
        first(when(col("__side") === 0, col("__w")), ignoreNulls = true)
          .as("__wa"),
        first(when(col("__side") === 1, col("__w")), ignoreNulls = true)
          .as("__wb"))
      .filter(col("__va").isNotNull && col("__vb").isNotNull)
      .select((round(expr(cosExpr("__va", "__vb")), 6) -
        round(expr(cosExpr("__wa", "__wb")), 6)).as("__e"))
      .select(expr("cast(floor(round(abs(__e), 6) * 10000) as int)")
        .as("err_bucket"))
      .groupBy(col("err_bucket"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Portable hashed bag-of-words document embeddings (feature hashing,
    * Weinberger '09): each token contributes +-1 at index
    * h(token) mod dim, where h is the first 32 bits of md5 (the
    * engine-portable hash: `('0x' || substr(md5_hex, 1, 8))::UBIGINT`
    * anywhere) and the sign comes from the NINTH hex digit's parity --
    * independent of the index bits, so sign and bucket don't correlate.
    * Integer counts, no floats anywhere: bit-portable across engines and
    * partitionings. Output is SPARSE (id, pos, v) cells -- at most
    * min(dim, distinct tokens) rows per doc cross the one exchange --
    * which is both the scale-honest shape and what the oracle replays.
    *
    * This makes the text->vector pipeline self-contained: the cells feed
    * the same cosine / ANN / persisted-index operators a model-produced
    * embedding column does, with no external model in the loop. The whole
    * chain is pure codegen'd SQL expressions -- no UDF, no kernel. */
  /** Leave-one-out 1-NN classification eval: each vector's label is
    * predicted by its single nearest neighbor (cosine, 6dp-rounded — the
    * q33 idiom — ties to the smaller id) among ALL OTHER vectors, and
    * accuracy rolls up per true label — the standard "are these
    * embeddings linearly useful?" probe (Cover & Hart '67 says 1-NN
    * error ≤ 2× Bayes). Deliberately BRUTE-FORCE: this is the eval
    * oracle for eval-sized samples (n² pairs, map-side argmax via one
    * struct-max aggregation, no window over the pair frame); at corpus
    * scale the persisted ANN index (q243/q244) answers the same
    * question approximately. Returns per label: support, correct,
    * accuracy permille. */
  def knnLooEval(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, maxCandidates: Int = 100000): DataFrame = {
    val v = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0 &&
        col(labelCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        expr(s"transform(`$vecCol`, x -> cast(x as double))").as("ve"),
        col(labelCol).cast("string").as("lbl"))
    // the candidate set broadcasts whole (this is the EVAL-sized probe).
    // Collect THROUGH the bound: limit(max+1) means a corpus-sized misuse
    // ships at most one extra row to the driver before the require fires,
    // instead of materializing the corpus first and OOMing silently.
    val cands = v.limit(maxCandidates + 1).collect()
    require(cands.length <= maxCandidates,
      s"knnLooEval is the brute-force eval probe: more than " +
        s"$maxCandidates vectors (maxCandidates) — use the " +
        "persisted ANN index for corpus-scale neighbors")
    val ids = cands.map(_.getLong(0))
    val lbls = cands.map(_.getString(2))
    val vecs = cands.map(_.getSeq[Double](1).toArray)
    val norms = vecs.map(a => math.sqrt(a.map(x => x * x).sum))
    val bc = df.sparkSession.sparkContext.broadcast((ids, lbls, vecs, norms))
    // one compiled argmax per row: dot in a fused loop, cosine rounded
    // 6dp via the same HALF_UP BigDecimal as Spark's round() (the
    // q33/q34 cross-engine idiom), ties to the smaller candidate id
    val nnUdf = udf((id: Long, ve: Seq[Double]) => {
      val (cids, clbls, cvecs, cnorms) = bc.value
      val q = ve.toArray
      var qn = 0.0
      var i = 0
      while (i < q.length) { qn += q(i) * q(i); i += 1 }
      qn = math.sqrt(qn)
      var bestCos = Double.NegativeInfinity
      var bestId = Long.MaxValue
      var bestLbl: String = null
      var c = 0
      while (c < cids.length) {
        if (cids(c) != id) {
          val w = cvecs(c)
          var dot = 0.0
          var j = 0
          while (j < q.length && j < w.length) { dot += q(j) * w(j); j += 1 }
          val cos = java.math.BigDecimal.valueOf(dot / (qn * cnorms(c)))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          if (cos > bestCos || (cos == bestCos && cids(c) < bestId)) {
            bestCos = cos; bestId = cids(c); bestLbl = clbls(c)
          }
        }
        c += 1
      }
      bestLbl
    })
    v.withColumn("__plbl", nnUdf(col("id"), col("ve")))
      .groupBy(col("lbl").as("label"))
      .agg(count(lit(1)).as("n"),
        sum((col("__plbl") === col("lbl")).cast("long")).as("n_correct"))
      .withColumn("accuracy_permille",
        expr("(n_correct * 1000) div n"))
  }

  /** Mutual nearest-neighbor pairs — the bitext-mining / duplicate-
    * alignment primitive (Artetxe & Schwenk '19 use the margin variant):
    * (a, b) pair iff each is the other's single nearest neighbor by
    * cosine. Same brute-force eval-sized contract and compiled
    * broadcast-argmax kernel as [[knnLooEval]] (6dp HALF_UP cosine,
    * ties to the smaller id); the mutual check is one self-join on the
    * O(V) best-neighbor frame. Returns (id_a < id_b, cosine). */
  def mutualNearestPairs(df: DataFrame, idCol: String, vecCol: String,
      maxCandidates: Int = 100000): DataFrame = {
    val v = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).cast("long").as("id"),
        expr(s"transform(`$vecCol`, x -> cast(x as double))").as("ve"))
    // same bounded-collect contract as knnLooEval: the +1 row proves
    // overflow without shipping the corpus to the driver
    val cands = v.limit(maxCandidates + 1).collect()
    require(cands.length <= maxCandidates,
      s"mutualNearestPairs is the brute-force eval probe: more than " +
        s"$maxCandidates vectors (maxCandidates)")
    val ids = cands.map(_.getLong(0))
    val vecs = cands.map(_.getSeq[Double](1).toArray)
    val norms = vecs.map(a => math.sqrt(a.map(x => x * x).sum))
    val bc = df.sparkSession.sparkContext.broadcast((ids, vecs, norms))
    val nnUdf = udf((id: Long, ve: Seq[Double]) => {
      val (cids, cvecs, cnorms) = bc.value
      val q = ve.toArray
      var qn = 0.0
      var i = 0
      while (i < q.length) { qn += q(i) * q(i); i += 1 }
      qn = math.sqrt(qn)
      var bestCos = Double.NegativeInfinity
      var bestId = Long.MaxValue
      var c = 0
      while (c < cids.length) {
        if (cids(c) != id) {
          val w = cvecs(c)
          var dot = 0.0
          var j = 0
          while (j < q.length && j < w.length) { dot += q(j) * w(j); j += 1 }
          val cos = java.math.BigDecimal.valueOf(dot / (qn * cnorms(c)))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          if (cos > bestCos || (cos == bestCos && cids(c) < bestId)) {
            bestCos = cos; bestId = cids(c)
          }
        }
        c += 1
      }
      (bestId, bestCos)
    })
    // spread the O(n·|cands|) argmax across cores (a 2k-row parquet read
    // is one partition) and materialize ONCE — the mutual self-join
    // would otherwise re-run the whole brute-force pass per side
    val best = v.repartition(32)
      .withColumn("__nn", nnUdf(col("id"), col("ve")))
      .select(col("id"), col("__nn._1").as("nn"),
        col("__nn._2").as("cos"))
      .localCheckpoint()
    best.as("x").join(best.as("y"),
        col("x.nn") === col("y.id") && col("y.nn") === col("x.id") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.cos").as("cosine"))
  }

  def hashedBowEmbed(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20), "dim must be in [2, 2^20]")
    val toks = filter(
      split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " "),
      t => length(t) > 0)
    df.select(col(idCol), explode(toks).as("__tok"))
      .select(col(idCol), md5(col("__tok")).as("__h"))
      .select(col(idCol),
        (conv(substring(col("__h"), 1, 8), 16, 10).cast("long") % dim)
          .cast("int").as("pos"),
        when(conv(substring(col("__h"), 9, 1), 16, 10)
            .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)).as("__s"))
      .groupBy(col(idCol), col("pos"))
      .agg(sum(col("__s")).as("v"))
  }

  /** Exact top-k retrieval by integer DOT PRODUCT over [[hashedBowEmbed]]
    * cells: score(q, d) = sum over shared positions of v_q * v_d, ranked
    * (score desc, doc asc), self-pairs excluded, docs sharing no position
    * drop (their dot is 0 -- never a useful neighbor). All-integer, so
    * the ranking is bit-portable. This is the brute-force exact baseline
    * of the ANN family (the q34 role): the query side is k-bounded and
    * broadcast, the corpus side streams -- per-query cost is one pass
    * over matching cells, and the recall-traded path for 100 TB is the
    * persisted PQ/IVF index (q243/q244), not this. */
  /** [[hashedBowTopK]] with the query side embedded SEPARATELY from the
    * k-bounded query documents instead of filtered out of the full
    * corpus cells: embedding is per-document, so the results are
    * identical — but filtering aggregated cells makes Spark run the
    * corpus-wide embed aggregation TWICE (once for the broadcast build,
    * once for the probe side; AQE query stages don't share it), while
    * this shape aggregates |queries| documents for the build and the
    * corpus exactly once. The difference is cosmetic at bench scale and
    * structural at 100 TB. */
  def hashedBowTopKFor(docs: DataFrame, idCol: String, textCol: String,
      queryIds: Seq[Long], k: Int, dim: Int = 64): DataFrame = {
    require(queryIds.nonEmpty && k >= 1, "need query ids and k >= 1")
    import org.apache.spark.sql.expressions.Window
    val cells = hashedBowEmbed(docs, idCol, textCol, dim)
    val q = hashedBowEmbed(docs.filter(col(idCol).isin(queryIds: _*)),
        idCol, textCol, dim)
      .select(col(idCol).as("query_id"), col("pos"), col("v").as("vq"))
    val dots = cells.join(broadcast(q), Seq("pos"))
      .filter(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("v") * col("vq")).as("dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col(idCol).asc)
    dots.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col(idCol), col("dot"))
  }

  def hashedBowTopK(cells: DataFrame, queryIds: Seq[Long], idCol: String,
      k: Int): DataFrame = {
    require(queryIds.nonEmpty && k >= 1, "need query ids and k >= 1")
    import org.apache.spark.sql.expressions.Window
    val q = cells.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col("pos"), col("v").as("vq"))
    val dots = cells.join(broadcast(q), Seq("pos"))
      .filter(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("v") * col("vq")).as("dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col(idCol).asc)
    dots.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col(idCol), col("dot"))
  }
}

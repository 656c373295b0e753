package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB training-data pipelines.
  *
  * Design for scale:
  *  - exact dedup = one shuffle on the dedup key (window rank), no collect;
  *  - MinHash signatures are per-row compiled kernels (no shingle explode
  *    across rows); only the *band* table (docs × bands rows) shuffles, and
  *    candidate verification touches candidate pairs only — the classic
  *    LSH-then-verify shape that avoids the O(n²) cross join;
  *  - SimHash reduces each doc to one 64-bit value; banding on 16-bit
  *    chunks (pigeonhole: hamming<=3 ⇒ one of 4 chunks equal) again keeps
  *    the join linear in candidates;
  *  - embedding near-dup uses random-hyperplane LSH buckets, exact cosine
  *    only within buckets.
  */
object Dedup {

  private val sha256Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** First `4*nHex` bits of sha-256(UTF-8 bytes) as an unsigned-safe long —
    * value-identical to `conv(substring(sha2(s, 256), 1, nHex), 16, 10)
    * .cast("long")` (the first nHex lowercase hex chars ARE the leading
    * 4*nHex digest bits) but with zero string work: no 64-char hex
    * rendering, no substring, no base-conversion parse. The portable twins
    * call this once per shingle/token, where the four-allocation hex chain
    * was the dominant cost (digest() resets the thread-local instance, so
    * reuse across rows is safe). */
  private[ext] def shaPrefixLongUdf(
      nHex: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(nHex >= 1 && nHex <= 15,
      "nHex must keep the value non-negative in a signed long")
    val shift = 64 - 4 * nHex
    udf((s: String) =>
      if (s == null) null.asInstanceOf[java.lang.Long]
      else {
        val d = sha256Local.get().digest(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
        java.lang.Long.valueOf(v >>> shift)
      })
  }

  /** Leading `64 - shift` bits of sha-256(UTF-8 bytes of `s[from, from+len)`)
    * as a non-negative long — the per-gram primitive behind the portable
    * twins' document kernels. Same value as [[shaPrefixLongUdf]] applied to
    * the substring (fixtures are ASCII, so char slicing == Spark's
    * code-point `substring`). */
  @inline private def shaPrefixAt(
      md: java.security.MessageDigest, s: String,
      from: Int, len: Int, shift: Int): Long = {
    val d = md.digest(s.substring(from, from + len)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> shift
  }

  /** Whole-document winnowing over portable sha-prefix gram hashes: all
    * k-gram hashes, sliding min of width `w`, per-doc distinct — in ONE
    * compiled pass. Exists because the explode-then-window formulation
    * pushed ~L rows per document through a UDF boundary and a window
    * exchange; this computes the identical distinct fingerprint set with
    * zero shuffle before the caller's explode. */
  private[ext] def portableWinnowKernel(
      text: String, k: Int, w: Int): Array[Long] = {
    if (text == null || text.length < k + w - 1) return Array.empty
    val md = sha256Local.get()
    val nGrams = text.length - k + 1
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hs(i) = shaPrefixAt(md, text, i, k, 64 - 4 * 8) // 8 hex chars = 32 bits
      i += 1
    }
    val out = scala.collection.mutable.HashSet.empty[Long]
    var p = 0
    val lastStart = nGrams - w
    while (p <= lastStart) {
      var m = hs(p)
      var j = 1
      while (j < w) { val h = hs(p + j); if (h < m) m = h; j += 1 }
      out += m
      p += 1
    }
    out.toArray
  }

  /** Whole-document portable MinHash: all shingle hashes (sha-prefix mod
    * the Mersenne prime) folded into the `numHashes` universal-hash minima
    * in ONE compiled pass — the signature the explode + groupBy
    * formulation produced, without the per-gram UDF boundary or the
    * aggregate exchange. */
  private[ext] def portableMinHashKernel(
      text: String, k: Int, numHashes: Int): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val md = sha256Local.get()
    val p = MersennePrime
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nGrams = text.length - k + 1
    var g = 0
    while (g < nGrams) {
      val h = shaPrefixAt(md, text, g, k, 4) % p // 15 hex chars = 60 bits
      var i = 0
      while (i < numHashes) {
        val v = ((2L * i + 1) * h + 1000003L * i) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      g += 1
    }
    mins
  }

  /** Exact dedup: keep, per distinct key combination, the row with the
    * smallest `idCol`. One hash-partitioned shuffle; deterministic. */
  def exactDedup(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[exactDedup]] WITH PROVENANCE: one row per distinct key holding the
    * surviving (minimum) `idCol`, how many duplicates it absorbed, and
    * the absorbed ids themselves, sorted and '#'-joined — the lineage a
    * right-to-be-forgotten pipeline needs (erasing id X must also erase
    * the survivor that replaced X, or X's content outlives the request),
    * and what a dedup audit samples. Same ONE key-partitioned shuffle as
    * [[exactDedup]]; the absorbed list is bounded by each key's
    * duplicate multiplicity, and a pathological key (a boilerplate page
    * with more than `maxCopies` copies) raises LOUDLY instead of
    * silently building a row-sized-like-a-partition string. */
  def exactDedupWithProvenance(df: DataFrame, keyCols: Seq[String],
      idCol: String, maxCopies: Int = 100000): DataFrame = {
    require(keyCols.nonEmpty && maxCopies >= 1,
      "exactDedupWithProvenance: need key columns and maxCopies >= 1")
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("__n"),
        // sort in the id's OWN domain (string-sorting numeric ids would
        // put "10" before "9" and strand the survivor mid-array), then
        // stringify for the join
        array_sort(collect_list(col(idCol))).as("__ids"))
      .select(keyCols.map(col) ++ Seq(
        col(idCol),
        (col("__n") - 1).as("n_absorbed"),
        when(col("__n") > maxCopies, raise_error(lit(
          s"exactDedupWithProvenance: a key exceeds maxCopies=" +
            s"$maxCopies duplicates — raise the cap deliberately or " +
            "audit that key first")))
          .otherwise(array_join(expr(
            "transform(slice(__ids, 2, greatest(size(__ids) - 1, 0)), " +
              "x -> cast(x as string))"), "#")).as("absorbed_ids")): _*)
  }

  /** Dedup-at-ingest: fold a batch into a versioned gold table keeping only
    * rows whose dedup key has never been seen — the continuous-crawl shape
    * where dedup happens when data ARRIVES instead of in a later O(corpus)
    * sweep. Within-batch ties resolve by smallest `idCol` ([[exactDedup]]);
    * cross-batch the FIRST batch to land a key wins (arrival-order
    * semantics — deliberately not global min-id, because at ingest time
    * later batches don't exist yet). The seen-key check is one LEFT ANTI
    * join against the gold table's stored `keyCol` — a single-column
    * pruned scan of the state that per-file bloom filters and
    * key-bucketing keep sub-linear at scale — and survivors land in ONE
    * append commit carrying their key, so state and data can never
    * diverge (no separate key table to drift). Refolding an already-seen
    * batch is a no-op by construction: its keys anti-join away.
    * Returns (ingested, dropped). */
  def dedupIngest(spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, goldTable: String,
      batch: DataFrame, keyCols: Seq[String], idCol: String,
      keyCol: String = "dedup_key",
      extraMeta: Map[String, String] = Map.empty): (Long, Long) = {
    require(keyCols.nonEmpty, "dedupIngest needs dedup key columns")
    require(!batch.columns.contains(keyCol),
      s"batch already has a '$keyCol' column; pass keyCol= a free name")
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    // U+0001-joined, nulls as a U+0002 sentinel: unambiguous for values
    // free of control chars, and portable -- any ANSI engine replays it as
    // md5(concat_ws(chr(1), coalesce(CAST(c AS VARCHAR), chr(2)), ...))
    val keyed = batch.withColumn(keyCol, md5(concat_ws("\u0001",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)))
    val inBatch = exactDedup(keyed, Seq(keyCol), idCol)
    val dir = Catalog.tablePath(lh, goldTable)
    // prior size comes off the manifest (metadata-only) so the appended
    // delta needs no second data pass
    val (survivors, before) = Versioned.latestVersion(dir) match {
      case None => (inBatch, 0L)
      case Some(v) =>
        val seen = TableIO.selectTable(spark, lh, goldTable).select(keyCol)
        (inBatch.join(seen, Seq(keyCol), "left_anti"),
          Versioned.readManifest(dir, v)
            .flatMap(TableIO.rowsFromManifest).getOrElse(0L))
    }
    val total = keyed.count()
    val kept = TableIO.appendTable(spark, lh, goldTable, survivors,
      extraMeta = extraMeta).rowCount - before
    (kept, total - kept)
  }

  /** Streaming dedup-at-ingest — [[dedupIngest]] driven by a live stream:
    * each micro-batch folds in exactly once (the txn-watermark contract:
    * the batch id commits atomically with the appended rows, so a batch
    * replayed after a crash between commit and checkpoint advance is
    * skipped — and even without the marker a replay is harmless, because
    * its keys are already in the state and anti-join away; the marker
    * buys versioned-history hygiene, not just correctness). Per-batch
    * cost: O(batch) keying + one anti-join against the pruned key
    * column. */
  def streamDedupIngest(events: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, goldTable: String,
      keyCols: Seq[String], idCol: String,
      checkpoint: Option[String] = None,
      appId: Option[String] = None) = {
    import graft.lakehouse.Catalog
    val txnKey = appId.orElse(checkpoint).map("txn:" + _)
    val w = events.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          val (_, committed) = EventWindows.txnWatermark(
            Catalog.tablePath(lh, goldTable), None,
            txnKey.map(_.stripPrefix("txn:")))
          if (!committed().exists(_ >= batchId)) {
            dedupIngest(spark, lh, goldTable, batch.toDF(), keyCols, idCol,
              extraMeta = txnKey.map(_ -> batchId.toString).toMap)
            ()
          }
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  // ---- MinHash + LSH -------------------------------------------------------

  private val MersennePrime = 2147483647L // 2^31 - 1; keeps a*h+b < 2^62 (no ANSI overflow)

  /** Deterministic (a,b) hash params, i-th universal hash = (a*h + b) mod p. */
  private def hashParams(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new java.util.Random(42L)
    Seq.fill(numHashes)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }

  // A note on implementation strategy: Spark higher-order-function lambdas
  // (transform/aggregate) are evaluated INTERPRETED, one expression tree per
  // element — a 64-hash x ~400-shingle signature means ~26k interpreted
  // evals per row, which measured ~200s for 50k docs. A tight JIT'd Scala
  // loop with an O(1) rolling shingle hash does the same work in seconds,
  // so the per-row kernels below are Scala UDFs; everything that SHUFFLES
  // (bands, joins, grouping) stays in the DataFrame API where Catalyst
  // plans it.

  private val RollBase = 1000003L

  /** MinHash signature as a compiled kernel: rolling polynomial k-gram hash
    * mod p (O(1) per shingle), then sig_i = min(a_i*h+b_i mod p). Duplicate
    * shingles can't change a min, so no dedup pass is needed. */
  private[ext] def minHashSigKernel(text: String, shingleK: Int,
      as: Array[Long], bs: Array[Long]): Array[Long] = {
    val p = MersennePrime
    val m = as.length
    val sig = Array.fill(m)(p - 1)
    if (text == null) return sig
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    val n = s.length
    def applyHash(h: Long): Unit = {
      var i = 0
      while (i < m) {
        val v = (as(i) * h + bs(i)) % p
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    if (n == 0) return sig
    if (n < shingleK) { applyHash(javaStringHash(s) % p); return sig }
    // rolling hash of s[i, i+k)
    var pow = 1L
    var j = 1
    while (j < shingleK) { pow = (pow * RollBase) % p; j += 1 }
    var h = 0L
    var i = 0
    while (i < shingleK) { h = (h * RollBase + s.charAt(i)) % p; i += 1 }
    applyHash(h)
    i = 1
    val last = n - shingleK
    while (i <= last) {
      h = ((h + p - (s.charAt(i - 1) * pow) % p) % p * RollBase +
        s.charAt(i + shingleK - 1)) % p
      applyHash(h)
      i += 1
    }
    sig
  }

  private def javaStringHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h & 0x7fffffffL
  }

  def withMinHashSignature(df: DataFrame, textCol: String, sigCol: String,
      shingleK: Int = 5, numHashes: Int = 64): DataFrame = {
    val params = hashParams(numHashes)
    val as = params.map(_._1).toArray
    val bs = params.map(_._2).toArray
    val sigUdf = udf[Array[Long], String](
      (t: String) => minHashSigKernel(t, shingleK, as, bs))
    df.withColumn(sigCol, sigUdf(col(textCol)))
  }

  /** LSH banding: (id, band_no, band_hash) — numHashes must divide into
    * bands of equal width rowsPerBand = numHashes/bands. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, bands: Int): DataFrame = {
    // bands must tile the signature exactly: `div` would silently drop
    // trailing hashes for non-divisors, and bands > |sig| makes every
    // band slice empty — one shared band_hash, i.e. the full O(n^2)
    // cross product LSH exists to avoid
    val sigLen = df.select(size(col(sigCol))).limit(1).collect()
      .headOption.map(_.getInt(0))
    sigLen.foreach(n => require(bands >= 1 && bands <= n && n % bands == 0,
      s"bands=$bands must divide the signature length $n"))
    df.select(col(idCol), posexplode(
      expr(s"transform(sequence(0, $bands - 1), b -> " +
        s"hash(slice($sigCol, b * (size($sigCol) div $bands) + 1, size($sigCol) div $bands)))"))
      .as(Seq("band_no", "band_hash")))
  }

  /** Candidate pairs from shared LSH buckets (a < b), deduplicated. */
  def lshCandidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val l = bandsDf.select(col(idCol).as("a"), col("band_no"), col("band_hash"))
    val r = bandsDf.select(col(idCol).as("b"), col("band_no"), col("band_hash"))
    l.join(r, Seq("band_no", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact distinct-shingle Jaccard kernel (hashes shingles to longs; the
    * collision probability over ~1e3-element sets is negligible). */
  private[ext] def shingleJaccardKernel(a: String, b: String, k: Int): Double = {
    def sets(t: String): java.util.HashSet[Long] = {
      val out = new java.util.HashSet[Long]()
      if (t == null) return out
      val s = t.toLowerCase.replaceAll("\\s+", " ").trim
      if (s.isEmpty) return out
      if (s.length < k) { out.add(javaStringHash(s)); return out }
      var i = 0
      while (i <= s.length - k) {
        var h = 0L
        var j = i
        while (j < i + k) { h = h * RollBase + s.charAt(j); j += 1 }
        out.add(h)
        i += 1
      }
      out
    }
    val sa = sets(a); val sb = sets(b)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    var common = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) common += 1
    common.toDouble / (sa.size + sb.size - common).toDouble
  }

  /** Exact Jaccard over distinct shingle sets for given candidate pairs:
    * join the pair list back to the texts (candidates are few), compute the
    * set overlap in a compiled kernel. */
  def verifyJaccard(df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, shingleK: Int): DataFrame = {
    val jacUdf = udf[Double, String, String](
      (a: String, b: String) => shingleJaccardKernel(a, b, shingleK))
    val texts = df.select(col(idCol), col(textCol))
    pairs
      .join(texts.select(col(idCol).as("a"), col(textCol).as("__ta")), "a")
      .join(texts.select(col(idCol).as("b"), col(textCol).as("__tb")), "b")
      .withColumn("jaccard", jacUdf(col("__ta"), col("__tb")))
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Materialize `result` (eager local checkpoint — it is a near-dup pair
    * list, tiny relative to the corpus) so the persisted intermediates it
    * was built from can be released immediately instead of leaking cached
    * blocks for the session lifetime. */
  private def materializeAndRelease(result: DataFrame,
      cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist())
    out
  }

  /** Full MinHash-LSH near-dup pair pipeline: signature → bands → candidate
    * pairs → exact-Jaccard verify at `threshold`. Eager: the (small) pair
    * list is materialized before returning so the cached signature table can
    * be released.
    *
    * Band tuning: with r = numHashes/bands rows per band, LSH's collision
    * threshold is ≈ (1/bands)^(1/r); the 8×8 default puts it at ~0.77,
    * matched to the 0.8 verify threshold. Wider bands (e.g. 16×4 → ~0.5)
    * flood the verifier with moderately-similar false candidates — measured
    * 130k candidates for 256 true pairs on the sf0.1 documents fixture. */
  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    // the signature UDF is the dominant per-row cost and feeds both legs of
    // the band self-join — persist it so it runs once
    val sig = withMinHashSignature(df, textCol, "__sig", shingleK, numHashes)
      .select(col(idCol), col("__sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandTable = lshBands(sig, idCol, "__sig", bands)
    val candidates = lshCandidatePairs(bandTable, idCol)
    val verified = verifyJaccard(df, idCol, textCol, candidates, shingleK)
      .filter(col("jaccard") >= threshold)
    materializeAndRelease(verified, sig)
  }

  /** Drop every row that near-duplicates a lower-id row (one LSH pass;
    * keeps cluster canonicals = rows never appearing as the higher id). */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Connected components over an undirected near-dup pair list (a, b):
    * each vertex gets `cc` = the minimum id reachable from it, so one
    * canonical per TRANSITIVE cluster (A~B, B~C groups all three even when
    * A~C was never emitted — the case pairwise dedup mishandles).
    *
    * Iterative min-label propagation: each round joins labels to the
    * symmetric edge list and takes the elementwise min with the best
    * neighbor label — O(diameter) rounds, and near-dup clusters are
    * shallow (diameter ≤ a handful), so this converges in 2–4 rounds.
    * Every round is one key-partitioned join+agg; lineage is cut per round
    * with an eager localCheckpoint so the plan stays flat at any scale.
    * A convergence count() per round is the only driver round-trip. */
  def connectedComponents(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b", maxIter: Int = 20): DataFrame = {
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cc", col("id")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels.select(col("id").as("src"), col("cc")), "src")
        .groupBy(col("dst").as("id")).agg(min("cc").as("nbr_cc"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cc"), coalesce(col("nbr_cc"), col("cc"))).as("cc"),
          col("cc").as("prev_cc"))
        .localCheckpoint(true)
      converged = next.filter(col("cc") < col("prev_cc")).isEmpty
      // `next` is already materialized — the projection can stay lazy
      // (re-checkpointing it paid one more O(V) materialization job per
      // round); lineage remains flat, rooted at the checkpointed frame
      labels = next.select("id", "cc")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — a " +
          s"cluster's diameter exceeds maxIter; raise maxIter (labels " +
          s"would silently split one true cluster into several)")
    labels
  }

  /** Keep one canonical row (the minimum id) per transitive near-dup
    * cluster; rows in no pair pass through untouched. */
  def dedupByComponents(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    df.join(cc.filter(col("id") =!= col("cc")).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
  }

  /** Keep the BEST row per transitive near-dup cluster — argmax of
    * `scoreCol`, ties to the smallest id — instead of
    * [[dedupByComponents]]'s arbitrary smallest-id survivor. This is the
    * production dedup: when a scrape holds five near-copies, the pipeline
    * should train on the longest / highest-quality one, not whichever got
    * the low id. Rows in no pair are their own (singleton) cluster and
    * always survive.
    *
    * One broadcast-size join of the cluster labels (O(clustered ids),
    * tiny vs the corpus) and one window over cluster keys — the corpus
    * shuffles once. */
  def dedupKeepBest(df: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    // NULL-id rows can never appear in a pair — they are singletons by
    // definition and pass through untouched (the cluster-key coalesce
    // below would otherwise collapse ALL of them into one NULL cluster
    // and keep a single survivor)
    val nullIds = df.filter(col(idCol).isNull)
    val withIds = df.filter(col(idCol).isNotNull)
    val cc = connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("cc").as("__cc"))
    val tagged = withIds.join(cc, withIds(idCol) === col("__cc_id"), "left")
      .withColumn("__cluster", coalesce(col("__cc"), withIds(idCol)))
    val w = Window.partitionBy(col("__cluster"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    tagged.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "__cluster", "__cc_id", "__cc")
      .unionByName(nullIds)
  }

  // ---- incremental dedup against a persisted index -------------------------

  /** The MinHash band table of a corpus — `(idCol, band_no, band_hash)` —
    * as a standalone, persistable artifact. Build it once when the corpus
    * is written, store it as a table, and every future ingest batch dedups
    * against it WITHOUT re-reading or re-hashing the historical corpus
    * (at 100 TB, re-LSHing history per batch is the difference between an
    * incremental pipeline and a nightly full rebuild). */
  def minHashBandIndex(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 8): DataFrame =
    lshBands(
      withMinHashSignature(df, textCol, "__sig", shingleK, numHashes)
        .select(col(idCol), col("__sig")),
      idCol, "__sig", bands)

  /** Exact Jaccard for (a, b) pairs whose texts live in two different
    * frames (new batch vs historical corpus). */
  private def verifyJaccardAcross(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, pairs: DataFrame,
      shingleK: Int): DataFrame = {
    val jacUdf = udf[Double, String, String](
      (a: String, b: String) => shingleJaccardKernel(a, b, shingleK))
    pairs
      .join(newDocs.select(col(idCol).as("a"), col(textCol).as("__ta")), "a")
      .join(corpus.select(col(idCol).as("b"), col(textCol).as("__tb")), "b")
      .withColumn("jaccard", jacUdf(col("__ta"), col("__tb")))
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Incremental near-dup detection: signature+band ONLY the new batch,
    * join its bands against the persisted corpus index, verify candidates
    * with exact Jaccard against the corpus texts. Returns
    * (a = new id, b = corpus id, jaccard) at/above `threshold`. The
    * historical corpus is touched only for the candidate rows' texts (a
    * key-join, prunable scan) — never re-hashed. Parameters must match the
    * ones the index was built with. */
  def nearDupsAgainstIndex(newDocs: DataFrame, corpus: DataFrame,
      index: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val newBands = minHashBandIndex(newDocs, idCol, textCol, shingleK,
      numHashes, bands).select(col(idCol).as("a"), col("band_no"),
      col("band_hash"))
    // no a != b filter: batch and corpus are DIFFERENT frames, so a batch
    // row re-ingested with its existing corpus id is exactly the duplicate
    // this operator must report (the self-join variant excludes a == b
    // because there it really is the same row)
    val candidates = newBands
      .join(index.select(col(idCol).as("b"), col("band_no"), col("band_hash")),
        Seq("band_no", "band_hash"))
      .select("a", "b").distinct()
    verifyJaccardAcross(newDocs, corpus, idCol, textCol, candidates, shingleK)
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens (Charikar'02): per token hash,
    * each bit votes ±1; sign of the vote sum sets the output bit. */
  def simHash64(text: String): Long = {
    if (text == null) return 0L
    val tokens = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    if (tokens.isEmpty) return 0L
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      var h = scala.util.hashing.MurmurHash3.stringHash(t).toLong & 0xffffffffL
      // widen to 64 bits deterministically
      h = h * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simHashUdf = udf[Long, String](simHash64 _)

  /** SimHash near-dup pairs with hamming distance <= maxDist, banding the
    * 64-bit hash into 4 16-bit chunks (pigeonhole guarantees recall for
    * maxDist <= 3). */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-band pigeonhole only guarantees hamming <= 3")
    val hashed = df.select(col(idCol), simHashUdf(col(textCol)).as("sh"))
    val banded = hashed.select(col(idCol), col("sh"), posexplode(
      expr("transform(sequence(0, 3), b -> (sh >> (b * 16)) & 65535)"))
      .as(Seq("band_no", "chunk")))
    val l = banded.select(col(idCol).as("a"), col("sh").as("sha"),
      col("band_no"), col("chunk"))
    val r = banded.select(col(idCol).as("b"), col("sh").as("shb"),
      col("band_no"), col("chunk"))
    // Dedup candidate pairs BEFORE computing hamming: a pair colliding in
    // multiple bands (near-identical hashes collide in all 4) would
    // otherwise pay bit_count per band occurrence and carry the wider row
    // through the exchange. sha/shb are functionally dependent on a/b, so
    // distinct on all four == distinct pairs with their hashes carried.
    l.join(r, Seq("band_no", "chunk"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sha", "shb")
      .distinct()
      .select(col("a"), col("b"),
        expr("bit_count(sha ^ shb)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** MinHash signatures with a PORTABLE shingle hash (sha-256-derived,
    * reduced mod the Mersenne prime) and literal universal-hash params
    * `a_i = 2i+1, b_i = 1000003·i` — any engine can recompute the identical
    * signature, making the min-over-universal-hash ALGORITHM verifiable
    * cross-engine ([[withMinHashSignature]]'s rolling-hash kernel stays the
    * production path). The whole signature is one compiled pass per
    * document ([[portableMinHashKernel]]) — no per-gram row inflation, no
    * aggregate exchange — unstacked to (id, sig_no, sig) rows (arrays
    * don't survive value comparison). */
  def portableMinHash(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 16): DataFrame = {
    val kern = udf((s: String) => portableMinHashKernel(s, shingleK, numHashes))
    df.select(col(idCol), posexplode(kern(col(textCol))).as(Seq("sig_no", "sig")))
  }

  /** LSH band keys over the PORTABLE minhash signature: the 16 sigs fold
    * into `numHashes / bandSize` bands whose key is the '#'-joined sig
    * run — exactly the banding [[minHashBandIndex]] uses in production,
    * but over engine-portable hashes, so an independent engine can
    * recompute every key (DuckDB: `string_agg(sig, '#' ORDER BY
    * sig_no)`). One row per (id, band_no). */
  def portableBandKeys(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 16, bandSize: Int = 4): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    val kern = udf((s: String) => {
      val sigs = portableMinHashKernel(s, shingleK, numHashes)
      if (sigs.isEmpty) Array.empty[String]
      else sigs.grouped(bandSize).map(_.mkString("#")).toArray
    })
    df.select(col(idCol),
      posexplode(kern(col(textCol))).as(Seq("band_no", "band_key")))
  }

  /** LSH threshold calibration: the exact-Jaccard decile histogram of
    * the CANDIDATE pairs the portable MinHash bands surface — the curve
    * a curator reads to pick the dedup threshold (candidates piling into
    * low deciles mean the banding is too loose: verification cost with
    * no dup yield; mass at the top means it could band harder). Jaccard
    * is computed exactly over the same character-k-shingle sets the
    * MinHash estimates, as integer permille, bucketed by decile.
    *
    * 100 TB shape: candidate generation is the LSH band join (the q30
    * contract — never corpus-all-pairs, but hot boilerplate bands do
    * pay their own pair count: that cost is exactly what this histogram
    * measures); exact verification joins pair×grams-of-a against a
    * (doc, gram)-keyed frame — every step is candidate-volume-bounded,
    * and the output is 11 rows. */
  def candidateJaccardHistogram(df: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 5, numHashes: Int = 16,
      bandSize: Int = 4): DataFrame = {
    // persisted: the SHA-per-gram signature kernel is the dominant cost
    // and the self-join would otherwise run it over the corpus TWICE
    // (ReusedExchange does not rescue two scan-side subtrees); the
    // banded frame is |docs| x (numHashes/bandSize) small rows.
    val bands = portableBandKeys(df, idCol, textCol, shingleK, numHashes,
      bandSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = bands.select(col(idCol).as("a"), col("band_no"),
      col("band_key"))
    val r = bands.select(col(idCol).as("b"), col("band_no"),
      col("band_key"))
    // candidate pairs feed BOTH the candidate-doc semi-join and the
    // final per-pair verification; persist keeps the band self-join to
    // one execution (pair volume is the LSH-bounded candidate set).
    // candidate pairs feed BOTH the candidate-doc semi-join and the
    // final verification join; persist keeps the band self-join at one
    // execution (pair volume is the LSH-bounded candidate set).
    val pairs = l.join(r, Seq("band_no", "band_key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candDocs = pairs.select(col("a").as(idCol))
      .unionByName(pairs.select(col("b").as(idCol))).distinct()
    // each candidate's distinct-gram SET builds IN-ROW (no explode, no
    // gram-level shuffle — the triangle-counting array_intersect trick):
    // the exact intersection then costs one compiled kernel per pair
    // instead of a |pairs| × grams-per-doc join explosion. A tight-loop
    // kernel, NOT transform(sequence(1, n), p -> substring(...)): Spark
    // evaluates higher-order lambdas interpreted (outside codegen) and
    // SQL substring re-walks the UTF-8 prefix per call — O(len²) per
    // document and ~5× the whole query's cost at sf0.1; the kernel is
    // one linear pass (the [[portableMinHashKernel]] indexing
    // convention, which the oracle's substring() replays).
    val gramsKernel = udf((s: String) => {
      if (s == null || s.length < shingleK) Array.empty[String]
      else {
        val set = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i <= s.length - shingleK) {
          set.add(s.substring(i, i + shingleK)); i += 1
        }
        set.toArray(new Array[String](set.size()))
      }
    })
    // persisted: BOTH broadcast builds below (a-side and b-side) read this
    // frame — without the persist each build re-runs the semi-join and the
    // gram kernel over every candidate document (two full evaluations,
    // measured ~1.2 s of the warm query at sf0.1)
    val gramSets = df.join(candDocs, Seq(idCol), "left_semi")
      .filter(length(col(textCol)) >= shingleK)
      .select(col(idCol), gramsKernel(col(textCol)).as("gset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // broadcast: the gram-set frame is per-CANDIDATE (LSH-bounded), but
    // its array payload (~grams-per-doc strings/row) crosses the default
    // autoBroadcast threshold, and a sort-merge join here would shuffle
    // every pair's two full gram arrays — the arrays must come to the
    // pairs, not travel. At corpus scale candidates stay a small slice
    // of the corpus (that is the point of banding); if a corpus ever
    // bands so hot the candidate gram sets outgrow the executors, the
    // exact-verify stage belongs on [[prefixFilterJaccardJoin]] instead.
    val hist = pairs
      .join(broadcast(gramSets.select(col(idCol).as("a"),
        col("gset").as("ga"))), Seq("a"))
      .join(broadcast(gramSets.select(col(idCol).as("b"),
        col("gset").as("gb"))), Seq("b"))
      .select(expr("size(array_intersect(ga, gb))").as("__c"),
        expr("size(ga)").as("__sza"), expr("size(gb)").as("__szb"))
      .select(expr("(__c * 1000) div (__sza + __szb - __c)").as("__jp"))
      .select(expr("cast(__jp div 100 as int)").as("decile"))
      .groupBy(col("decile")).agg(count(lit(1)).as("n_pairs"))
    // the histogram is O(10) rows: materialize it eagerly into a local
    // frame so every persisted intermediate can be RELEASED here —
    // previously bands/pairs stayed pinned for the session's lifetime
    val spark = hist.sparkSession
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(hist.collect().toSeq, 1), hist.schema)
    gramSets.unpersist(false)
    pairs.unpersist(false)
    bands.unpersist(false)
    out
  }

  /** Dedup-savings census over a clustering (e.g.
    * [[connectedComponents]] output): the cluster-size histogram —
    * per size, how many clusters, how many documents they hold, and how
    * many a keep-one-per-cluster dedup would remove — the census a
    * pipeline reads to decide whether near-dup dedup is worth its cost
    * and how skewed the duplicate mass is (ten 1000-doc boilerplate
    * clusters vs a million pairs are very different corpora at the same
    * dup rate). Two aggregations, both cluster-bounded: ids → cluster
    * sizes, sizes → histogram rows. */
  def clusterCensus(components: DataFrame, componentCol: String)
      : DataFrame = {
    components.groupBy(col(componentCol))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_removable"))
  }

  /** Cross-source near-duplicate containment matrix — the mixture-design
    * question "how much of source A already lives inside source B?",
    * answered with the PORTABLE MinHash bands ([[portableBandKeys]]):
    * cell (A, B) counts A's documents that band-collide with at least one
    * OTHER document of B (the diagonal (A, A) is A's internal near-dup
    * rate), plus that count as an integer permille of A's doc total.
    * Zero-overlap cells are materialized (a complete |S|² matrix).
    *
    * 100 TB shape — never all-pairs, never bucket-quadratic: the right
    * side collapses to per-(band, key, source) doc COUNTS before the
    * join, so each left doc-band row matches at most |sources| aggregated
    * rows no matter how hot a bucket is (a boilerplate band shared by a
    * million docs is still ONE row per source on the build side); the
    * |S|² completion joins two |S|-row aggregates. Docs shorter than
    * `shingleK` chars have no signature and count only in the
    * denominators — run exact containment alongside for those
    * ([[fuzzyDecontaminate]]'s scope note). */
  def sourceOverlapMatrix(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, shingleK: Int = 5, numHashes: Int = 16,
      bandSize: Int = 4): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    val kern = udf((s: String) => {
      val sigs = portableMinHashKernel(s, shingleK, numHashes)
      if (sigs.isEmpty) Array.empty[String]
      else sigs.grouped(bandSize).map(_.mkString("#")).toArray
    })
    val bands = df.select(col(idCol), col(sourceCol).as("__src"),
      posexplode(kern(col(textCol))).as(Seq("band_no", "band_key")))
    val keySrc = bands.groupBy(col("band_no"), col("band_key"),
        col("__src").as("src_b"))
      .agg(count(lit(1)).as("__n_key"))
    val hits = bands.join(keySrc, Seq("band_no", "band_key"))
      .filter(col("src_b") =!= col("__src") || col("__n_key") >= 2)
      .select(col("__src").as("src_a"), col("src_b"), col(idCol))
      .distinct()
    val overlap = hits.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_overlap"))
    val totals = df.groupBy(col(sourceCol).as("src_a"))
      .agg(count(lit(1)).as("n_docs_a"))
    val full = totals.crossJoin(
      totals.select(col("src_a").as("src_b")))
    full.join(overlap, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_docs_a"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        expr("(coalesce(n_overlap, 0) * 1000) div n_docs_a")
          .as("overlap_permille"))
  }

  /** FUZZY benchmark decontamination: drop training documents that
    * MinHash-band-collide with ANY eval/benchmark document — catches the
    * paraphrased/truncated contamination exact n-gram containment
    * ([[ngramContamination]], q53) misses, at LSH cost instead of
    * all-pairs. The eval side reduces to a distinct (band_no, band_key)
    * index that is BROADCAST (benchmarks are tiny next to a 100 TB
    * corpus), so the training side is scanned once, never shuffled, and
    * drops flagged docs with one anti-join. Returns the surviving train
    * rows.
    *
    * Scope: shingle-based matching needs at least one k-shingle — docs
    * shorter than `shingleK` characters produce no signature and are
    * invisible to THIS pass. Run [[ngramContamination]] (exact n-gram
    * containment) alongside it; short leaks are exact leaks. */
  def fuzzyDecontaminate(train: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 5,
      numHashes: Int = 16, bandSize: Int = 4): DataFrame = {
    val tb = portableBandKeys(train, idCol, textCol, shingleK, numHashes,
      bandSize)
    val eb = portableBandKeys(evalDocs, idCol, textCol, shingleK, numHashes,
      bandSize).select(col("band_no"), col("band_key")).distinct()
    val hit = tb.join(broadcast(eb), Seq("band_no", "band_key"))
      .select(col(idCol)).distinct()
    train.join(hit, Seq(idCol), "left_anti")
  }

  /** Incremental near-dup detection, PORTABLE twin of the persisted-index
    * path ([[nearDupsAgainstIndex]], q64): batch ids sharing ≥ 1 LSH band
    * with the corpus. The corpus side is exactly what a persisted band
    * index stores — the batch never re-hashes the corpus in production;
    * here both sides recompute so a SQL oracle can verify the banding,
    * the signature algebra, and the join end-to-end (q91). Broadcast-
    * friendly: only (band_no, band_key) pairs cross the wire. */
  def portableIncrementalDups(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 5,
      numHashes: Int = 16, bandSize: Int = 4): DataFrame = {
    val idx = portableBandKeys(corpus, idCol, textCol, shingleK, numHashes,
      bandSize).select("band_no", "band_key").distinct()
    portableBandKeys(batch, idCol, textCol, shingleK, numHashes, bandSize)
      .join(idx, Seq("band_no", "band_key"), "left_semi")
      .select(idCol).distinct()
  }

  /** Whole-document portable SimHash in one compiled pass: whitespace
    * split, per-token 60-bit sha-256 prefix, Charikar sign aggregation —
    * no explode, no UDF boundary per token occurrence, no wide per-bit
    * aggregate. `memo` caches token → hash within a task (sha-256 is the
    * dominant cost and natural text repeats tokens heavily); the caller
    * bounds it. Returns null when the document has no tokens — those
    * documents produce no rows, exactly as the explode formulation
    * dropped them. */
  private[ext] def portableSimHashKernel(text: String, bits: Int,
      memo: java.util.HashMap[String, java.lang.Long]): java.lang.Long = {
    if (text == null) return null
    val toks = text.split("\\s+")
    val votes = new Array[Int](bits)
    var any = false
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      if (tok.nonEmpty) {
        any = true
        var h = memo.get(tok)
        if (h == null) {
          val d = sha256Local.get().digest(
            tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var k = 0
          while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
          // first 15 hex chars = 60 bits: unsigned-safe in a BIGINT
          // everywhere (same value as shaPrefixLongUdf(15))
          h = java.lang.Long.valueOf(v >>> 4)
          memo.put(tok, h)
        }
        val hv = h.longValue()
        var j = 0
        while (j < bits) {
          votes(j) += (if (((hv >> j) & 1L) == 1L) 1 else -1); j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }

  /** SimHash with a PORTABLE token hash — 60 bits from sha-256, so any
    * engine can recompute the identical signature and Charikar's
    * sign-aggregation algorithm is verifiable end-to-end cross-engine
    * ([[simHash64]]'s compiled murmur kernel stays the production path).
    *
    * Plan shape: ONE compiled per-document kernel
    * ([[portableSimHashKernel]]), zero shuffle — the earlier
    * explode + per-occurrence sha UDF + 60-column aggregate paid a UDF
    * boundary per token occurrence and re-hashed every repeat of a token;
    * the kernel hashes each distinct token once per task (bounded memo,
    * cleared at 256k entries so a pathological vocabulary can't grow the
    * executor heap). Tokens = whitespace split, empties dropped; repeated
    * tokens vote repeatedly; a zero vote sum is a 0 bit. */
  def portableSimHash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 60): DataFrame = {
    require(bits > 0 && bits < 64, "bits must fit a signed 64-bit value")
    val b = bits
    val kernel = new (String => java.lang.Long) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, java.lang.Long]()
      override def apply(text: String): java.lang.Long = {
        if (memo.size() > 256 * 1024) memo.clear()
        portableSimHashKernel(text, b, memo)
      }
    }
    val u = udf(kernel)
    df.select(col(idCol), u(col(textCol)).as("simhash"))
      .where(col("simhash").isNotNull)
  }

  // ---- word n-gram Jaccard -------------------------------------------------

  /** Distinct word n-grams as a compiled kernel (the HOF slice/concat
    * formulation is interpreted per gram). Semantics mirror the SQL
    * construction exactly: normalize whitespace, split, clip the last
    * window, so the DuckDB oracle stays value-identical. */
  private[ext] def wordNgramKernel(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1)
    val last = math.max(toks.length - n, 0)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i <= last) {
      out += toks.slice(i, math.min(i + n, toks.length)).mkString(" ")
      i += 1
    }
    out.toArray
  }

  def wordNgrams(textCol: String, n: Int): Column = {
    val u = udf((t: String) => wordNgramKernel(t, n))
    u(col(textCol))
  }

  /** Exact word-n-gram Jaccard pairs with stop-gram pruning: grams
    * appearing in more than `maxDocFreq` docs are dropped from every set
    * (bounds the quadratic blowup on 100 TB; logged assumption) before
    * |∩|/|∪| closes over the surviving grams. Cost-based two-plan
    * dispatch, the [[prefixFilterJaccardPairs]] pattern:
    *
    * Both plans start from ONE persisted per-doc distinct-gram-hash frame
    * and ONE counts-only frequency aggregation (map-side combine → the
    * exchange is O(vocab), never O(tokens)) that keeps only the grams
    * over the cap — the stop-gram set, tiny on natural text.
    *
    * DENSE plan (stop-set broadcastable AND surviving token volume under
    * `denseMaxTokens`): heavy grams drop IN-ROW against the broadcast
    * set, then an inverted self-join with sizes riding the exploded rows
    * — the per-pair group-count IS the exact overlap; Bayardo'07 length
    * filtering kills size-incompatible pairs pre-aggregation. No posting
    * lists, no re-explode, no sizes join: the wide
    * `sort_array(collect_list)` aggregation and the second index pass the
    * previous formulation paid never happen.
    *
    * POSTING-LIST plan (the scale path): one gram-keyed aggregation
    * builds each surviving gram's sorted posting list; candidate pairs
    * generate INSIDE the row (all i<j combinations — bounded at
    * maxDocFreq²/2 per gram by the cap) and reduce by one (a, b)
    * aggregation — the classic self-join never happens.
    *
    * Eager: the (small) pair list is materialized before returning so
    * the caches release. Grams are hashed to 64-bit longs (xxhash64) in
    * the scan stage, before anything shuffles — every downstream
    * exchange moves 8-byte keys instead of gram strings. Collisions
    * would need ~2^32 distinct grams to appear at even odds; per-corpus
    * gram counts are far below that (and the DuckDB oracle, which joins
    * on the raw strings, verifies value-equality of the output at test
    * scale). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 1, threshold: Double = 0.8, maxDocFreq: Long = 1000,
      denseMaxTokens: Long = 2000000, maxHeavyGrams: Long = 4000000): DataFrame = {
    val tExact = lit(scala.math.BigDecimal(java.lang.Double.toString(threshold)))
    val par = df.sparkSession.sparkContext.defaultParallelism
    // per-doc DISTINCT gram hashes, computed in-row (the kernel dedupes;
    // xxhash64 inside the lambda keeps every downstream exchange on
    // 8-byte keys) — persisted: the frequency agg and whichever pair plan
    // runs read this cache instead of re-tokenizing. The input is spread
    // across cores FIRST: a corpus this size often arrives in one parquet
    // split, which would serialize the tokenizer, the frequency agg's map
    // side, and the dense plan's whole probe leg onto a single task.
    val d = df.repartition(par, col(idCol))
      .select(col(idCol),
        transform(wordNgrams(textCol, n), g => xxhash64(g)).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE counts-only frequency aggregation (map-side combine → the
    // exchange is O(vocab), never O(tokens)); dispatch stats come from
    // one scan of it, the stop-gram set from a second cached scan.
    val freqAll = d.select(explode(col("hs")).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("df_count"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = freqAll.agg(
      coalesce(sum("df_count"), lit(0L)).as("vol"),
      count(when(col("df_count") > maxDocFreq, 1)).as("n_heavy"),
      coalesce(sum(when(col("df_count") > maxDocFreq, col("df_count"))),
        lit(0L)).as("heavy_vol")).head()
    val (totVol, nHeavy, heavyVol) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    // Cost-based dispatch (guards steer cost, never correctness — both
    // plans return the identical exact answer): when the stop-gram set
    // fits a broadcast AND the surviving token volume fits the dense
    // plan's broadcast build side, drop heavy grams IN-ROW against the
    // broadcast set and run the dense inverted self-join — per-pair
    // group-count IS the overlap, sizes ride the rows, no posting lists,
    // no re-explode. Otherwise (100 TB shape): the posting-list plan —
    // in-row pair generation bounded at maxDocFreq²/2 per gram.
    if (nHeavy <= maxHeavyGrams && totVol - heavyVol <= denseMaxTokens) {
      val heavySet = new java.util.HashSet[java.lang.Long](
        (nHeavy * 2 + 16).toInt)
      freqAll.filter(col("df_count") > maxDocFreq).select("gh").collect()
        .foreach(r => heavySet.add(r.getLong(0)))
      freqAll.unpersist()
      val bcHeavy = df.sparkSession.sparkContext.broadcast(heavySet)
      val survUdf = udf((hs: Seq[Long]) => {
        val h = bcHeavy.value
        hs.filter(x => !h.contains(x)).toArray
      })
      val surv =
        if (heavySet.isEmpty) d.select(col(idCol), col("hs").as("ts"))
        else d.select(col(idCol), survUdf(col("hs")).as("ts"))
      def leg(base: DataFrame): DataFrame =
        base.select(col(idCol), size(col("ts")).as("sz"),
            ceil(size(col("ts")) * tExact).cast("long").as("lb"),
            explode(col("ts")).as("t"))
      // probe needs no extra exchange — d was spread at the scan
      val probe = leg(surv)
      val build = leg(surv)
      val result = probe.select(col(idCol).as("a"), col("sz").as("sza"),
          col("lb").as("lba"), col("t"))
        .join(broadcast(build.select(col(idCol).as("b"), col("sz").as("szb"),
          col("lb").as("lbb"), col("t"))), "t")
        // length filter (Bayardo et al.): t·|a| <= |b| <= |a|/t, exact
        // decimal ceil precomputed per doc — size-incompatible pairs die
        // before the aggregation
        .filter(col("a") < col("b") &&
          col("szb") >= col("lba") && col("sza") >= col("lbb"))
        .groupBy("a", "b", "sza", "szb").agg(count(lit(1)).as("common"))
        .withColumn("jaccard", col("common").cast("double") /
          (col("sza") + col("szb") - col("common")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
      return materializeAndRelease(result, d)
    }
    freqAll.unpersist()
    // posting-list plan: the index feeds two consumers (sizes + pairs):
    // persist it or the explode+aggregate pipeline runs twice (AQE plans
    // the consumers as separate query stages, so exchange reuse does NOT
    // cover this — measured 1.6x slower without the persist)
    val idx = d.select(col(idCol), explode(col("hs")).as("gh"))
      .groupBy("gh")
      .agg(count(lit(1)).as("df_count"),
        sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("df_count") <= maxDocFreq)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = idx.select(explode(col("ids")).as(idCol))
      .groupBy(idCol).agg(count(lit(1)).as("sz"))
    // Singleton grams (df_count = 1) still count toward |set| above, but
    // can never produce an inter-document pair — on natural text they are
    // the hapax-legomena majority of the vocabulary, so they never reach
    // pair generation. Sorted posting lists make every emitted (a, b)
    // satisfy a < b by construction.
    val pairs = idx.filter(col("df_count") >= 2)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "y -> struct(x AS a, y AS b))))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val result = pairs
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col(idCol).as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard", col("common").cast("double") /
        (col("sza") + col("szb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
    materializeAndRelease(result, idx, d)
  }

  /** Exact Jaccard-threshold similarity join via PREFIX FILTERING (the
    * AllPairs/PPJoin family — Bayardo, Ma & Srikant, "Scaling Up All Pairs
    * Similarity Search", WWW'07): under ANY shared total token order, two
    * sets with J(a,b) >= t must share at least one token within each set's
    * first `|s| - ceil(t*|s|) + 1` tokens. Ordering tokens RAREST-FIRST
    * puts the least common tokens in those prefixes, so the candidate join
    * touches near-nothing on natural corpora while remaining provably
    * complete. Unlike [[ngramJaccardPairs]]'s stop-gram cap (which DROPS
    * frequent grams from the similarity space — a documented
    * approximation), the answer here is the complete exact one: frequent
    * tokens still count in verification, they just rarely generate
    * candidates.
    *
    * 100 TB shape: the canonical order is one token-frequency aggregation;
    * candidate generation shuffles only (docId, prefixToken, position)
    * triples — the prefix is O((1-t)·|tokens|) per doc; PPJoin's
    * positional filter (§3.2: common tokens keep their relative order
    * under the shared total order, so overlap <= min suffix length past
    * the first shared prefix token) kills size-compatible-but-hopeless
    * candidates before the distinct and the array-carrying verification
    * join, which computes an exact array-intersect Jaccard (false
    * positives die there; the prefix theorem rules out false negatives).
    * No driver-side state anywhere. Tokens travel as xxhash64 longs
    * after the scan stage, like every other dedup pipeline here.
    *
    * Cost-based plan choice: prefix filtering pays ~7 sequential stages
    * (freq agg, order join, regroup, candidate join, distinct, two
    * verify joins) — the right trade when the candidate join would
    * otherwise explode on frequent tokens, pure overhead on a corpus
    * small enough that the full inverted-index join is itself cheap. When
    * the input has at most `denseMaxDocs` documents the operator runs the
    * dense plan instead: explode, self-join on every token with the set
    * sizes riding the rows, and count shared tokens per pair — two
    * shuffles, no verification join, exactly the same answer (the
    * group-by count IS the exact overlap). `denseMaxDocs` docs bound the
    * worst-case pair space at denseMaxDocs²/2; the default keeps that
    * below ~8M pair rows, and a token-volume guard (`denseMaxTokens`)
    * additionally bounds the dense plan's broadcast build side, so a few
    * thousand pathologically long documents can never blow the driver.
    * When, additionally, the corpus vocabulary is tiny (template-generated
    * text, log lines, ID-like fields — the regime where EVERY document
    * shares tokens with every other and inverted-index candidate
    * generation degenerates to the full quadratic join anyway), the
    * operator runs a third plan: each document's token set becomes a
    * vocabulary BITMASK and an all-pairs broadcast nested-loop join
    * computes exact overlaps as popcount(maskA & maskB) — the per-pair
    * cost falls from a hash-join probe per shared token to ceil(V/64)
    * AND+popcount word ops. Pass denseMaxDocs = 0 to force the prefix
    * plan, bitsetMaxVocab = 0 to disable the bitset plan.
    *
    * The tokenized per-doc arrays are persisted ONCE up front: the
    * dispatch statistics, both legs of whichever join runs, and the
    * frequency aggregation all read the cache instead of re-running the
    * tokenizer per leg. Dispatch stats use approx_count_distinct (a
    * single combine-friendly pass at any scale); the guards are cost
    * heuristics with margin, never correctness conditions — all three
    * plans return the identical exact answer. */
  def prefixFilterJaccardPairs(df: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.6,
      denseMaxDocs: Long = 4096,
      denseMaxTokens: Long = 2000000,
      bitsetMaxVocab: Long = 4096): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0, 1]")
    val tExact = lit(scala.math.BigDecimal(java.lang.Double.toString(threshold)))
    val d = df.select(col(idCol), wordNgrams(textCol, 1).as("ws"))
      .select(col(idCol), expr("filter(ws, w -> w <> '')").as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (denseMaxDocs > 0) {
      // one job: materializes the cache AND returns the dispatch stats
      // (docs-with-tokens, token volume, approx vocabulary)
      val stats = d.select(col(idCol), explode(col("ws")).as("w"))
        .agg(approx_count_distinct(idCol), count(lit(1)),
          approx_count_distinct("w"))
        .head()
      val (nDocs, tokVol, vocab) =
        (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      if (nDocs <= denseMaxDocs) {
        // ~3e8 word ops keeps the all-pairs loop well under a second on
        // tens of cores; the 1.1 factor absorbs approx_count_distinct's
        // ~2% HLL error (guards only steer cost, never correctness)
        val words = vocab / 64 + 1
        if (bitsetMaxVocab > 0 && vocab <= bitsetMaxVocab &&
            1.1 * nDocs * nDocs * words <= 3e8)
          return bitsetJaccardPairs(d, idCol, threshold, tExact)
        if (tokVol <= denseMaxTokens)
          return denseJaccardPairs(d, idCol, threshold, tExact)
      }
    }
    val toks = d.select(col(idCol), explode(col("ws")).as("w"))
      .select(col(idCol), xxhash64(col("w")).as("t"))
    val freq = toks.groupBy("t").agg(count(lit(1)).as("tf"))
    // rarest-first canonical order = ascending (docFreq, tokenHash); the
    // struct sort gives every document the same total order for free
    val docs = toks.join(freq, "t")
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("tf"), col("t")))).as("ts"))
      // EXACT prefix arithmetic: double ceil(sz * t) rounds past the
      // true product for some (t, sz) (100 * 0.55 -> 55.000...01 -> 56),
      // shortening the prefix below the provable bound and silently
      // dropping threshold-boundary pairs; decimal multiply is exact for
      // the decimal rendering of t
      .withColumn("plen",
        (size(col("ts")) - ceil(size(col("ts")) *
          lit(scala.math.BigDecimal(java.lang.Double.toString(threshold))))
          + lit(1)).cast("int"))
      // A prefix token with corpus doc-frequency 1 exists in exactly one
      // document: its only candidate row would self-join (killed by
      // a < b), so it is filtered out of the candidate-generation slice
      // map-side — the hapax majority of prefixes never shuffles. The
      // full token array (`toks`) keeps every token: verification
      // arithmetic is untouched, output provably identical. Each prefix
      // token keeps its 0-based position in the FULL ordered array
      // (indices are assigned before the hapax filter) for the
      // positional test below.
      .select(col(idCol),
        expr("transform(ts, x -> x.t)").as("toks"),
        size(col("ts")).as("sz"),
        expr("filter(transform(slice(ts, 1, plen), " +
          "(x, i) -> struct(i as pos, x.tf as tf, x.t as t)), " +
          "x -> x.tf >= 2)").as("ptoks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pref = docs.select(col(idCol), col("sz"),
      explode(col("ptoks")).as("p"))
      .select(col(idCol), col("sz"), col("p.pos").as("pos"), col("p.t").as("t"))
    // length filter (also Bayardo et al.): J(a,b) >= t forces
    // t·|a| <= |b| <= |a|/t — size-incompatible candidates die BEFORE the
    // distinct and the array-carrying verification join. Same exact
    // decimal-ceil as plen so a boundary pair can never be over-pruned.
    //
    // Positional filter (PPJoin, Xiao et al. WWW'08 §3.2): both docs are
    // sorted by the same (tf, t) total order, so their common tokens
    // appear in the same relative order; past a shared prefix token at
    // 0-based positions (pa, pb), at most min(sza-pa, szb-pb) tokens can
    // still be common. J >= t needs overlap >= t·(sza+szb)/(1+t); the
    // 1e-9 nudge keeps float rounding from pushing the required-overlap
    // ceiling ABOVE its true value (over-admitted candidates die in exact
    // verification; over-pruning would lose answers, so the error must
    // only ever point down).
    val cand = pref.select(col(idCol).as("a"), col("sz").as("sza"),
        col("pos").as("pa"), col("t"))
      .join(pref.select(col(idCol).as("b"), col("sz").as("szb"),
        col("pos").as("pb"), col("t")), "t")
      .filter(col("a") < col("b") &&
        col("szb") >= ceil(col("sza") * tExact) &&
        col("sza") >= ceil(col("szb") * tExact) &&
        least(col("sza") - col("pa"), col("szb") - col("pb")) >=
          ceil((col("sza") + col("szb")) * lit(threshold / (1.0 + threshold))
            - lit(1e-9)))
      .select("a", "b").distinct()
    val result = cand
      .join(docs.select(col(idCol).as("a"), col("toks").as("ta"),
        col("sz").as("sza")), "a")
      .join(docs.select(col(idCol).as("b"), col("toks").as("tb"),
        col("sz").as("szb")), "b")
      .withColumn("common", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard", col("common").cast("double") /
        (col("sza") + col("szb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
    materializeAndRelease(result, docs, d)
  }

  /** Dense-corpus exact Jaccard plan: full inverted-index self-join with
    * each document's set size (and its precomputed long size-bound, so the
    * per-pair filter is pure integer compares — no decimal math in the
    * quadratic loop) riding the exploded rows; the per-pair group-by count
    * IS the exact overlap — no separate verification join, no re-grouping
    * of token arrays. The build leg is broadcast (bounded by the
    * denseMaxTokens guard) and the probe leg is repartitioned by id first:
    * a dense corpus this small typically arrives in one input split, and
    * without the spread the whole quadratic probe would run on a single
    * core. `d` is the persisted (id, tokenArray) frame from the public
    * entry point. Same answer as the prefix plan by construction (both
    * count shared distinct non-empty lowercase tokens). */
  private def denseJaccardPairs(d: DataFrame, idCol: String,
      threshold: Double, tExact: Column): DataFrame = {
    def leg(base: DataFrame): DataFrame =
      base.select(col(idCol), size(col("ws")).as("sz"),
          explode(col("ws")).as("w"))
        .select(col(idCol), col("sz"),
          ceil(col("sz") * tExact).cast("long").as("lb"),
          xxhash64(col("w")).as("t"))
    val par = d.sparkSession.sparkContext.defaultParallelism
    val probe = leg(d.repartition(par, col(idCol)))
    val build = leg(d)
    val result = probe.select(col(idCol).as("a"), col("sz").as("sza"),
        col("lb").as("lba"), col("t"))
      .join(broadcast(build.select(col(idCol).as("b"), col("sz").as("szb"),
        col("lb").as("lbb"), col("t"))), "t")
      // length filter (Bayardo et al.): t·|a| <= |b| <= |a|/t via the
      // exact decimal ceil, precomputed per doc above
      .filter(col("a") < col("b") &&
        col("szb") >= col("lba") && col("sza") >= col("lbb"))
      .groupBy("a", "b", "sza", "szb").agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("sza") + col("szb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
    materializeAndRelease(result, d)
  }

  /** Small-vocabulary exact Jaccard plan: assign each distinct token a bit
    * position (the window-without-partitioning runs over the DISTINCT
    * vocabulary, bounded by the bitsetMaxVocab guard — never the corpus),
    * fold every document's token set into a long[] bitmask, then an
    * all-pairs broadcast nested-loop join scores each surviving pair as
    * popcount(maskA & maskB). Masks are sized to each doc's highest bit
    * (zip_with pads the shorter mask with nulls; coalesce maps those to 0,
    * which is exact — a doc holds no tokens beyond its own mask). The
    * stream leg is explicitly spread across cores first: the masks frame
    * is a few thousand rows, which AQE would otherwise coalesce to one
    * partition and serialize the quadratic loop. Reachable only when
    * nDocs²·words fits the op budget in the dispatcher above. */
  private def bitsetJaccardPairs(d: DataFrame, idCol: String,
      threshold: Double, tExact: Column): DataFrame = {
    val toks = d.select(col(idCol), explode(col("ws")).as("w"))
    val vocab = toks.select("w").distinct()
      .withColumn("vid", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("w")) - 1)
        .cast("int"))
    val maskUdf = udf((ids: Seq[Int]) => {
      val m = new Array[Long](ids.max / 64 + 1)
      ids.foreach(i => m(i / 64) |= (1L << (i % 64)))
      m
    })
    val par = d.sparkSession.sparkContext.defaultParallelism
    val masks = toks.join(broadcast(vocab), "w")
      .groupBy(idCol).agg(collect_list(col("vid")).as("vids"))
      .select(col(idCol), size(col("vids")).as("sz"),
        maskUdf(col("vids")).as("m"))
      .withColumn("lb", ceil(col("sz") * tExact).cast("long"))
    val a = masks.repartition(par, col(idCol))
      .select(col(idCol).as("a"), col("sz").as("sza"),
        col("lb").as("lba"), col("m").as("ma"))
    val b = masks.select(col(idCol).as("b"), col("sz").as("szb"),
      col("lb").as("lbb"), col("m").as("mb"))
    val result = a.join(broadcast(b),
        col("a") < col("b") &&
        col("szb") >= col("lba") && col("sza") >= col("lbb"))
      // codegen'd popcount kernel — an interpreted zip_with/aggregate tree
      // here costs ~2 s over a few million pairs; the fused loop is noise
      .withColumn("common", graft.lakehouse.functions.VectorFunctions
        .graft_bitand_count(col("ma"), col("mb")))
      .withColumn("jaccard", col("common").cast("double") /
        (col("sza") + col("szb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
    materializeAndRelease(result, d)
  }

  /** Exact ASYMMETRIC containment join: pairs (a, b) where
    * C(a→b) = |tokens(a) ∩ tokens(b)| / |tokens(a)| ≥ threshold — "a is
    * mostly contained in b". The relation Jaccard cannot express: an
    * excerpt, a quoted paragraph, or a truncated crawl of a 100× larger
    * page scores C ≈ 1 while its Jaccard is tiny. The training-data use
    * is excerpt/supersession detection — drop the fragment, keep the
    * superset document.
    *
    * Prefix filtering adapts (Bayardo WWW'07 §5): C(a→b) ≥ t means b
    * misses at most |a| − ⌈t·|a|⌉ of a's tokens, so b must share one of
    * the first |a| − ⌈t·|a|⌉ + 1 tokens of a's canonical rarest-first
    * order. Unlike the symmetric join there is NO length upper bound on
    * b (a 5-token quote is contained in a 5M-token book), so the probe
    * side contributes only prefixes while the INDEX side contributes
    * every token — the classic probe-prefix/full-index asymmetry. The
    * prefix arithmetic uses the same exact decimal ceil as
    * [[prefixFilterJaccardPairs]] (float ceil over-shortens prefixes for
    * some (t, size) and silently drops boundary pairs). Hapax prefix
    * tokens (corpus df = 1) are dropped map-side — their only index
    * match is the probe doc itself, killed by a ≠ b.
    *
    * 100 TB shape: one token-frequency aggregation for the canonical
    * order, candidates shuffle (id, token) pairs only, and the exact
    * array-intersect verification join — false positives die there,
    * the prefix theorem rules out false negatives — touches only
    * candidate pairs. Nothing collects.
    *
    * Cost-based plan choice, same dispatch as
    * [[prefixFilterJaccardPairs]]: on a corpus small enough that the
    * full inverted-index join is itself cheap (template-heavy corpora
    * where MOST pairs qualify and the answer is near-quadratic — the
    * regime where prefix pruning prunes nothing and the array-carrying
    * verification join just repays the candidate join with worse
    * constants), the operator runs the dense plan instead: per-token
    * self-join with the probe's set size riding the rows, group-by
    * count IS the exact intersection — two shuffles, no verification
    * join, identical answer. Pass denseMaxDocs = 0 to force the prefix
    * plan. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.9, denseMaxDocs: Long = 4096,
      denseMaxTokens: Long = 2000000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0, 1]")
    val tExact = lit(scala.math.BigDecimal(java.lang.Double.toString(threshold)))
    val d = df.select(col(idCol), wordNgrams(textCol, 1).as("ws"))
      .select(col(idCol), expr("filter(ws, w -> w <> '')").as("ws"))
      .filter(size(col("ws")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (denseMaxDocs > 0) {
      val stats = d.select(col(idCol), explode(col("ws")).as("w"))
        .agg(approx_count_distinct(idCol), count(lit(1))).head()
      val (nDocs, tokVol) = (stats.getLong(0), stats.getLong(1))
      if (nDocs <= denseMaxDocs && tokVol <= denseMaxTokens)
        return denseContainmentPairs(d, idCol, threshold)
    }
    val toks = d.select(col(idCol), explode(col("ws")).as("w"))
      .select(col(idCol), xxhash64(col("w")).as("t"))
    val freq = toks.groupBy("t").agg(count(lit(1)).as("tf"))
    val docs = toks.join(freq, "t")
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("tf"), col("t")))).as("ts"))
      .withColumn("plen",
        (size(col("ts")) - ceil(size(col("ts")) * tExact) + lit(1))
          .cast("int"))
      .select(col(idCol),
        expr("transform(ts, x -> x.t)").as("toks"),
        size(col("ts")).as("sz"),
        expr("filter(slice(ts, 1, plen), x -> x.tf >= 2)").as("ptoks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probe = docs.select(col(idCol).as("a"), explode(col("ptoks")).as("p"))
      .select(col("a"), col("p.t").as("t"))
    val index = docs.select(col(idCol).as("b"), explode(col("toks")).as("t"))
    val cand = probe.join(index, "t")
      .filter(col("a") =!= col("b"))
      .select("a", "b").distinct()
    val result = cand
      .join(docs.select(col(idCol).as("a"), col("toks").as("ta"),
        col("sz").as("sza")), "a")
      .join(docs.select(col(idCol).as("b"), col("toks").as("tb")), "b")
      .withColumn("common", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("containment",
        col("common").cast("double") / col("sza").cast("double"))
      .filter(col("containment") >= threshold)
      .select("a", "b", "containment")
    materializeAndRelease(result, docs, d)
  }

  /** Dense-corpus exact containment plan (the [[denseJaccardPairs]]
    * shape, asymmetric): full inverted-index self-join on the hashed
    * token with the PROBE side's set size riding the exploded rows; the
    * per-pair group-by count IS the exact intersection, and one division
    * by the probe size finishes the score. No length filter exists to
    * apply (containment has no size bound on the superset side). The
    * build leg is broadcast (bounded by the denseMaxTokens guard); the
    * probe leg spreads by id first so a single-split corpus doesn't run
    * the quadratic join on one core. Answer identical to the prefix plan
    * by construction. */
  private def denseContainmentPairs(d: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    val par = d.sparkSession.sparkContext.defaultParallelism
    val probe = d.repartition(par, col(idCol))
      .select(col(idCol).as("a"), size(col("ws")).as("sza"),
        explode(col("ws")).as("w"))
      .select(col("a"), col("sza"), xxhash64(col("w")).as("t"))
    val build = d.select(col(idCol).as("b"), explode(col("ws")).as("w"))
      .select(col("b"), xxhash64(col("w")).as("t"))
    val result = probe.join(broadcast(build), "t")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b", "sza").agg(count(lit(1)).as("common"))
      .withColumn("containment",
        col("common").cast("double") / col("sza").cast("double"))
      .filter(col("containment") >= threshold)
      .select("a", "b", "containment")
    materializeAndRelease(result, d)
  }

  /** Benchmark decontamination: for each training document, the containment
    * of each eval document's distinct word n-grams (|train ∩ eval| /
    * |eval|). Pairs at/above `threshold` are contamination hits the
    * pipeline must drop before pretraining.
    *
    * Scale shape: the eval side (benchmarks) is tiny by construction, so
    * its hashed gram index and per-doc sizes ride a BROADCAST — the 100 TB
    * train side explodes and joins map-side with no shuffle; the only
    * exchange is the groupBy on surviving (train, eval) candidate pairs. */
  def ngramContamination(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 5, threshold: Double = 0.1): DataFrame = {
    def hashedGrams(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
          explode(wordNgrams(textCol, n)).as("gram"))
        .select(col(outId), xxhash64(col("gram")).as("gh"))
    val tg = hashedGrams(train, "train_id")
    val eg = hashedGrams(evalSet, "eval_id")
    val esz = eg.groupBy("eval_id").agg(count(lit(1)).as("eval_grams"))
    tg.join(broadcast(eg), "gh")
      .groupBy("train_id", "eval_id").agg(count(lit(1)).as("overlap"))
      .join(broadcast(esz), "eval_id")
      .withColumn("containment",
        col("overlap").cast("double") / col("eval_grams").cast("double"))
      .filter(col("containment") >= threshold)
      .select("train_id", "eval_id", "overlap", "containment")
  }

  /** Cross-split contamination audit: after a train/heldout split, the
    * per-stratum fraction of heldout documents sharing at least one word
    * n-gram with ANY train document — the leakage number that decides
    * whether a heldout metric can be trusted (GPT-3's train/test overlap
    * analysis, run as a pipeline gate). Complements
    * [[ngramContamination]] (which scores external eval sets); this one
    * audits the split the pipeline itself produced, so a buggy splitter
    * that leaks near-copies across the cut is caught by the number, not
    * by a reviewer.
    *
    * Scale shape: grams hash to 8 bytes (xxhash64) and dedup per
    * (doc, gram) on each side; ONE left-semi join marks contaminated
    * heldout docs (the heldout side is the small split fraction — AQE
    * broadcasts it when it fits, shuffles otherwise); totals and the
    * integer permille come from one |strata|-bounded aggregation. The
    * train side is gram-distinct only — no doc ids cross the exchange
    * for it. */
  def crossSplitLeakage(split: DataFrame, idCol: String, textCol: String,
      splitCol: String, trainLabel: String, heldLabel: String,
      n: Int, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "crossSplitLeakage needs stratum columns")
    val trainGrams = split.filter(col(splitCol) === trainLabel)
      .select(explode(wordNgrams(textCol, n)).as("gram"))
      .select(xxhash64(col("gram")).as("gh")).distinct()
    val heldGrams = split.filter(col(splitCol) === heldLabel)
      .select(col(idCol) +: groupCols.map(col) :+
        explode(wordNgrams(textCol, n)).as("gram"): _*)
      .select(col(idCol) +: groupCols.map(col) :+
        xxhash64(col("gram")).as("gh"): _*)
      .distinct()
    val contaminated = heldGrams.join(trainGrams, Seq("gh"), "left_semi")
      .select(col(idCol) +: groupCols.map(col): _*).distinct()
      .withColumn("__c", lit(1))
    split.filter(col(splitCol) === heldLabel)
      .select(col(idCol) +: groupCols.map(col): _*)
      .join(contaminated, idCol +: groupCols, "left_outer")
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_heldout"),
        sum(coalesce(col("__c"), lit(0))).as("n_contaminated"))
      .select(groupCols.map(col) :+ col("n_heldout") :+
        col("n_contaminated") :+
        expr("n_contaminated * 1000 div n_heldout").as("leak_permille"): _*)
  }

  // ---- embedding cosine near-dup ------------------------------------------

  /** Deterministic random hyperplanes (H x dim), seed fixed. */
  private[ext] def hyperplanes(h: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(h, dim)(rnd.nextGaussian())
  }

  /** Exact cosine similarity between two array<double> columns — native
    * codegen'd Expression (a fused dot+norms loop; the HOF formulation
    * `aggregate(zip_with(...))` is interpreted per element). */
  def cosine(a: Column, b: Column): Column =
    graft.lakehouse.functions.VectorFunctions.graft_cosine(a, b)

  /** Random-hyperplane signature bucket (int) for an array<double> column.
    * Each plane is ONE array literal (`typedlit`), not a CreateArray of
    * dim scalar literals — 12×64 literal nodes made Janino's first
    * compilation of this plan the dominant cost of the whole query. */
  def rhpBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeArr = typedlit(p.toSeq)
      val dot = graft.lakehouse.functions.VectorFunctions.graft_dot(vec, planeArr)
      when(dot >= 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Embedding near-dup pairs: LSH-bucket on `numPlanes` random hyperplanes,
    * exact cosine within buckets only (near-identical vectors land in the
    * same bucket with high probability; multi-probe = rerun with another
    * seed and union). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numPlanes: Int = 12, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val vecd = df.select(col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("bucket", rhpBucket(col("v"), planes))
    val l = vecd.select(col(idCol).as("a"), col("v").as("va"), col("bucket"))
    val r = vecd.select(col(idCol).as("b"), col("v").as("vb"), col("bucket"))
    l.join(r, "bucket").filter(col("a") < col("b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space (bounded fit
    * sample driver-side, one broadcast assignment pass over the corpus),
    * then within each cluster drop every vector that has a smaller-id
    * neighbor with cosine ≥ `threshold`. Returns the SURVIVING input rows
    * unchanged.
    *
    * The pairwise work is cluster-bounded — O(Σ n_c²) instead of corpus-
    * quadratic, tuned by `nClusters` (the paper uses ~√n clusters at
    * web scale) — and the only shuffle is the cluster-keyed self-join.
    * Clustering only ever SPLITS the comparison set, so the clustered
    * survivors are a superset of the exhaustive rule's survivors, and an
    * exact duplicate always shares its original's cluster (tie-broken
    * identically in [[Similarity.nearestCellUdf]]) — exact copies are
    * removed at any `nClusters`. With `nClusters = 1` the rule is
    * exhaustive: drop iff ANY smaller-id vector in the corpus is within
    * the threshold — directly SQL-checkable (the q89 oracle). */
  /** Blocked sorted-neighborhood candidate pairs (Hernández & Stolfo,
    * SIGMOD'95 — the classic dedup-blocking alternative to LSH banding
    * and prefix filtering): normalize each record to a sort key
    * (lowercased alphanumerics, first `keyChars`), sort WITHIN
    * `blockChars`-prefix blocks, and emit every pair at rank distance
    * < `window` — near-duplicates sort adjacently, so a tiny window
    * catches them without any all-pairs work. Pair generation is an
    * in-block rank self-join: the left side replicates `window−1` rows,
    * never the corpus. The window sort is PARTITIONED by block (the
    * multi-pass SNM formulation) — at 100 TB each block sorts
    * independently; a partition-less global sort is exactly the
    * foot-gun this variant exists to avoid. Deterministic: ranks order
    * by (key, id). Output: block, id_a, id_b (a < b in rank), rank gap,
    * whether the full keys agree. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      textCol: String, window: Int = 3, blockChars: Int = 4,
      keyChars: Int = 12): DataFrame = {
    require(window >= 2 && window <= 16, "window in [2, 16]")
    require(blockChars >= 1 && keyChars > blockChars,
      "need keyChars > blockChars >= 1")
    val key = substring(regexp_replace(lower(coalesce(col(textCol),
      lit(""))), "[^a-z0-9]", ""), 1, keyChars)
    val ranked = df
      .select(col(idCol).cast("long").as("id"), key.as("key"))
      .filter(length(col("key")) >= blockChars)
      .withColumn("block", substring(col("key"), 1, blockChars))
      .withColumn("rn", row_number().over(
        Window.partitionBy("block").orderBy(col("key").asc,
          col("id").asc)))
    val left = ranked
      .withColumn("off",
        explode(typedlit((1 until window).toList)))
      .select(col("block"), col("id").as("id_a"),
        col("key").as("key_a"), col("off").as("gap"),
        (col("rn") + col("off")).as("rn"))
    left.join(ranked.select(col("block"), col("id").as("id_b"),
        col("key").as("key_b"), col("rn")), Seq("block", "rn"))
      .select(col("block"), col("id_a"), col("id_b"), col("gap"),
        col("key_a"), col("key_b"),
        (col("key_a") === col("key_b")).as("same_key"))
  }

  /** Fixed-weight Fellegi–Sunter linkage scoring (JASA '69) over
    * candidate pairs: each field contributes its agreement weight when
    * the two records null-safely agree and its (negative) disagreement
    * weight otherwise; the summed integer score classifies into
    * match / possible / non_match by the two thresholds. The weights
    * are the caller's ln(m/u)-style integers (pre-scaled — the
    * production calibration from labeled data happens upstream), so the
    * whole decision is exact integer arithmetic. Scale shape: candidate
    * pairs come from a blocking stage ([[sortedNeighborhoodPairs]],
    * MinHash bands) — this is two attribute joins and a per-row sum,
    * O(pairs), never all-pairs. */
  def fellegiSunterScore(pairs: DataFrame, attrs: DataFrame,
      idCol: String, fields: Seq[(String, Int, Int)],
      matchAt: Int, possibleAt: Int): DataFrame = {
    require(fields.nonEmpty, "fellegiSunterScore needs >= 1 field")
    require(matchAt > possibleAt,
      "thresholds must order matchAt > possibleAt")
    def side(tag: String): DataFrame = attrs.select(
      (col(idCol).cast("long").as(s"id_$tag") +:
        fields.map { case (f, _, _) => col(f).as(s"${tag}_$f") }): _*)
    val scored = pairs.select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .join(side("a"), Seq("id_a"))
      .join(side("b"), Seq("id_b"))
      .withColumn("score", fields.map { case (f, aw, dw) =>
        when(col(s"a_$f") <=> col(s"b_$f"), lit(aw.toLong))
          .otherwise(lit(dw.toLong))
      }.reduce(_ + _))
    scored.select(col("id_a"), col("id_b"), col("score"),
      when(col("score") >= matchAt, "match")
        .when(col("score") >= possibleAt, "possible")
        .otherwise("non_match").as("decision"))
  }

  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nClusters: Int = 16,
      maxFitRows: Long = 100000L, corpusRows: Option[Long] = None): DataFrame = {
    // null embeddings can't be compared — they survive untouched (they
    // never enter the pairwise pass) instead of NPE-ing the k-means fit
    val c = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
    val assigned =
      if (nClusters <= 1) c.withColumn("__cell", lit(0))
      else {
        val nRows = corpusRows.getOrElse(c.count())
        val fit =
          if (nRows <= maxFitRows) c
          else c.sample(withReplacement = false,
            maxFitRows.toDouble / nRows, seed = 42L)
        val sample = fit.select("__v").collect()
          .map(_.getSeq[Double](0).toArray)
        if (sample.isEmpty) return df // empty/all-null corpus: no dups
        val centroids =
          Similarity.lloydKMeans(sample, nClusters, iters = 10, seed = 42L)
        val bc = df.sparkSession.sparkContext.broadcast(centroids)
        c.withColumn("__cell", Similarity.nearestCellUdf(bc)(col("__v")))
      }
    val l = assigned.select(col("__cell"),
      col("__id").as("__a"), col("__v").as("__va"))
    val r = assigned.select(col("__cell"),
      col("__id").as("__b"), col("__v").as("__vb"))
    val dropped = l.join(r, "__cell").filter(col("__a") < col("__b"))
      .filter(cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("__b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }
}

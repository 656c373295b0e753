package graft.lakehouse.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the byte-level dedup primitive
  * behind storage dedup and long-document near-dup: chunk boundaries
  * derive from the CONTENT (a rolling/window hash firing on a mask),
  * not from fixed offsets, so inserting a byte near the start shifts
  * only the chunks up to the next boundary — every later chunk
  * re-aligns and its hash matches the unedited copy (the
  * shift-resistance fixed-size chunking cannot have; Muthitacharoen et
  * al. SOSP'01 "LBFS").
  *
  * Two implementations, the q28/q75 portable-twin pattern:
  *   - [[gearChunks]] — the PRODUCTION path: gear hash (Xia et al.
  *     FAST'16 FastCDC's rolling primitive), O(1) per byte, one table
  *     lookup + shift + add; min/max chunk-length clamps. The gear
  *     table is engine-private → its boundary set is too (rows-only
  *     verification + property specs).
  *   - [[portableCdcChunks]] — the VERIFICATION surface: the boundary
  *     predicate is sha-256 of each w-char window mod m == 0 — any
  *     engine reproduces it exactly (DuckDB replays per-position
  *     substr + sha256, the q427/q437 machinery), at O(w) per
  *     position. Same chunk semantics, hash-matched end to end.
  *
  * Both are pure per-document kernels: zero shuffle before the
  * caller's sink, chunk identity travels as a sha-256 prefix (the
  * q430 contract — chunks are joined by hash, never shipped). */
object Cdc {

  /** 256-entry gear table, deterministically derived (first 8 bytes of
    * sha-256 of the byte value's decimal string) — stable across JVMs
    * and versions, private to this engine. */
  private lazy val gear: Array[Long] = {
    val md = MessageDigest.getInstance("SHA-256")
    Array.tabulate(256) { b =>
      val h = md.digest(b.toString.getBytes(StandardCharsets.UTF_8))
      md.reset()
      ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
        ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
        ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    }
  }

  private def sha16(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** Gear-hash CDC (FastCDC's rolling primitive): boundary after
    * position i when `(h & mask) == 0` with `h = (h << 1) + gear(c)`,
    * h reset at each boundary, subject to `minLen`/`maxLen` clamps
    * (a boundary never fires before minLen; one is forced at maxLen).
    * One row per chunk: `(id, chunk_idx, chunk_start, chunk_len,
    * chunk_sha)`. `maskBits` sets the expected chunk length (~2^bits).
    * O(1) per character — the 100 TB path. */
  def gearChunks(df: DataFrame, idCol: String, textCol: String,
      maskBits: Int = 6, minLen: Int = 16,
      maxLen: Int = 1024): DataFrame = {
    require(maskBits >= 1 && maskBits <= 48 && minLen >= 1 &&
      maxLen > minLen, "gearChunks: 1<=maskBits<=48, 1<=minLen<maxLen")
    val mask = (1L << maskBits) - 1L
    val g = gear // stable local for the closure
    val kernel = udf((text: String) => {
      if (text == null || text.isEmpty)
        Array.empty[(Int, Int, Int, String)]
      else {
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Int, Int, String)]
        var start = 0
        var h = 0L
        var i = 0
        var idx = 0
        def cut(end: Int): Unit = {
          out += ((idx, start, end - start,
            sha16(text.substring(start, end))))
          idx += 1; start = end; h = 0L
        }
        while (i < text.length) {
          h = (h << 1) + g(text.charAt(i) & 0xff)
          val len = i - start + 1
          if ((len >= minLen && (h & mask) == 0L) || len >= maxLen)
            cut(i + 1)
          i += 1
        }
        if (start < text.length) cut(text.length)
        out.toArray
      }
    })
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), explode(kernel(col(textCol))).as("c"))
      .select(col(idCol), col("c._1").as("chunk_idx"),
        col("c._2").cast("long").as("chunk_start"),
        col("c._3").cast("long").as("chunk_len"),
        col("c._4").as("chunk_sha"))
  }

  /** Portable CDC: a boundary closes after every w-char window whose
    * 60-bit sha-256 value (first 15 hex chars — the engine-portable
    * keyed-hash contract of q192/q198) is ≡ 0 mod m; chunks are the
    * segments between consecutive boundaries plus the trailing
    * remainder; a document with no boundary is one chunk. NO min/max
    * clamps — eligibility would depend on the previous boundary, which
    * is exactly the sequential dependency a SQL replay cannot express;
    * the clamped production semantics live in [[gearChunks]]. Output
    * as [[gearChunks]]. O(w) per position — the verification path. */
  def portableCdcChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 16, modulus: Long = 64L): DataFrame = {
    require(window >= 1 && modulus >= 1,
      "portableCdcChunks: window >= 1, modulus >= 1")
    val kernel = udf((text: String) => {
      if (text == null || text.isEmpty)
        Array.empty[(Int, Int, Int, String)]
      else {
        val md = MessageDigest.getInstance("SHA-256")
        val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
        var p = 0
        while (p + window <= text.length) {
          val d = md.digest(text.substring(p, p + window)
            .getBytes(StandardCharsets.UTF_8))
          md.reset()
          // first 15 hex chars = top 60 bits, non-negative in a long
          var v = 0L
          var k = 0
          while (k < 8) {
            v = (v << 8) | (d(k) & 0xffL)
            k += 1
          }
          v = v >>> 4 // 64 - 60
          if (v % modulus == 0L) cuts += p + window
          p += 1
        }
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Int, Int, String)]
        var startPos = 0
        var idx = 0
        (cuts :+ text.length).foreach { e =>
          if (e > startPos) {
            out += ((idx, startPos, e - startPos,
              sha16(text.substring(startPos, e))))
            idx += 1; startPos = e
          }
        }
        out.toArray
      }
    })
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), explode(kernel(col(textCol))).as("c"))
      .select(col(idCol), col("c._1").as("chunk_idx"),
        col("c._2").cast("long").as("chunk_start"),
        col("c._3").cast("long").as("chunk_len"),
        col("c._4").as("chunk_sha"))
  }

  /** Cross-document chunk-level dedup census over any chunk frame
    * (`gearChunks` or `portableCdcChunks` output): per duplicated
    * chunk hash, the occurrence count and how many distinct documents
    * share it — the storage-dedup ratio frame. ONE aggregation shuffle
    * on the chunk hash. */
  def chunkDupCensus(chunks: DataFrame, idCol: String): DataFrame =
    chunks.groupBy(col("chunk_sha"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        max(col("chunk_len")).as("chunk_len"))
      .filter(col("n_occurrences") >= 2)
}

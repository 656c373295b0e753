package graft

import graft.lakehouse.SparkSuite
import graft.lakehouse.ext._
import org.apache.spark.sql.functions._

/** End-to-end composition test: the full training-data preparation flow a
  * user of this library would run — scrub → quality-filter → dedup (exact,
  * then near-dup with transitive clustering) → chunk → pack — asserting
  * the conservation/containment invariants that must hold between stages
  * regardless of fixture content. */
class PipelineIntegrationSpec extends SparkSuite {
  import spark.implicits._

  test("scrub -> filter -> dedup -> chunk -> pack composes coherently") {
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val n0 = raw.count()

    // 1. PII scrub — row-preserving
    val scrubbed = raw.withColumn("text", TextStats.scrubPII($"text"))
    assert(scrubbed.count() == n0)

    // 2. quality filter: drop high-repetition docs — monotone subset
    val rep = TextStats.repetitionMetrics(scrubbed, "doc_id", "text")
    val quality = scrubbed.join(
      rep.filter($"dup_line_frac" < 0.5).select("doc_id"), "doc_id")
    val n2 = quality.count()
    assert(n2 <= n0 && n2 > 0)

    // 3. exact dedup then near-dup clustering — each a subset of the last
    val exact = Dedup.exactDedup(quality, Seq("text"), "doc_id")
    val n3 = exact.count()
    assert(n3 <= n2)
    val pairs = Dedup.minHashNearDupPairs(exact, "doc_id", "text",
      threshold = 0.8)
    val canonical = Dedup.dedupByComponents(exact, "doc_id", pairs)
    val n4 = canonical.count()
    assert(n4 <= n3 && n4 > 0)
    // the fixture plants near-dups (8 <-> 12): exactly one survives
    assert(canonical.filter($"doc_id".isin(8L, 12L)).count() <= 1)

    // 4. chunk — every surviving doc with text yields >= 1 chunk, none lost
    val chunks = TextStats.chunkDocuments(canonical, "doc_id", "text",
      chunkSize = 200, overlap = 40)
    val chunkedDocs = chunks.select("doc_id").distinct().count()
    assert(chunkedDocs == canonical.filter($"text".isNotNull).count())

    // 5. pack chunks into token budgets — row-preserving, budget respected
    val withLen = chunks.withColumn("n_tokens",
      length($"chunk_text").cast("long"))
    val packed = Packing.packSequences(withLen, "n_tokens", budget = 2048L)
    assert(packed.count() == chunks.count())
    val over = Packing.packSummary(packed, "n_tokens")
      .filter($"sum_tokens" > 2048L && $"n_docs" > 1).count()
    assert(over == 0)
  }
}

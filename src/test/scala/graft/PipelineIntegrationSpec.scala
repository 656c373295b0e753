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

  test("ingest -> dsir-select -> dedup -> atomic two-table publish: the " +
      "lakehouse round trip") {
    import graft.lakehouse._
    import java.nio.file.Files
    val lh = Catalog.registerLocalWorkspace(
      Files.createTempDirectory("pipe_lh").toString, "ws_pipe", "lh_pipe")
      .lakehouses.head
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text", $"lang")

    // 1. land as a two-batch json zone; COPY INTO loads incrementally
    val src = Files.createTempDirectory("pipe_src").toString
    raw.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.mode("append").json(src)
    Ingest.copyInto(spark, lh, "docs_raw", src, format = "json",
      schema = Some(raw.schema))
    raw.filter($"doc_id" % 2 =!= 0).coalesce(1)
      .write.mode("append").json(src)
    val r2 = Ingest.copyInto(spark, lh, "docs_raw", src, format = "json",
      schema = Some(raw.schema))
    assert(r2.filesLoaded == 1, r2)
    val landed = TableIO.selectTable(spark, lh, "docs_raw")
    assert(landed.count() == raw.count())
    assert(Ingest.loadHistory(spark, lh, "docs_raw").count() == 2)

    // 2. DSIR: keep the 40 most french-like docs
    val selected = Dsir.selectTopK(landed.select($"doc_id", $"text"),
      landed.filter($"lang" === "fr").select($"doc_id", $"text"),
      "doc_id", "text", k = 40)
      .join(landed, "doc_id").select($"doc_id", $"text", $"score")
    assert(selected.count() == 40)

    // 3. dedup the selection
    val deduped = Dedup.exactDedup(selected, Seq("text"), "doc_id")
    val nFinal = deduped.count()
    assert(nFinal <= 40 && nFinal > 0)

    // 4. publish corpus + its stats table ATOMICALLY — a reader can
    // never see the corpus without its stats row
    val stats = deduped.agg(
      count(lit(1)).as("docs"), sum(length($"text")).as("chars"))
    val h = Txn.begin(lh)
    Txn.write(h, spark, lh, "corpus", deduped)
    Txn.write(h, spark, lh, "corpus_stats", stats)
    assert(Versioned.latestVersion(
      Catalog.tablePath(lh, "corpus")).isEmpty) // invisible pre-commit
    Txn.commit(h)
    assert(TableIO.selectTable(spark, lh, "corpus").count() == nFinal)
    assert(TableIO.selectTable(spark, lh, "corpus_stats")
      .head().getLong(0) == nFinal)
  }
}

package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy hygiene audits for training-data curation: before a table
  * (or extracted metadata about people) ships into a corpus, find the
  * re-identifiable slices. Complements [[TextStats.scrubPII]] (which
  * masks surface strings): these operators measure STRUCTURAL
  * disclosure — how small the quasi-identifier equivalence classes are
  * (k-anonymity, Samarati & Sweeney 1998) and how little the sensitive
  * attribute varies inside them (l-diversity, Machanavajjhala et al.
  * ICDE 2006). Both audits are exact integer counting — one aggregation
  * each, engine-reproducible, no randomness.
  */
object Privacy {

  /** Equivalence classes over the quasi-identifier columns that fall
    * below `k` members — the rows a linkage attack can pin to fewer than
    * k candidates. Returns (quasiCols…, class_size) for each violating
    * class. Null is a quasi-identifier VALUE like any other (two rows
    * with null ZIP are in the same class — groupBy's null-safe grouping
    * does exactly this).
    *
    * 100 TB shape: one hash aggregation on the quasi columns (map-side
    * partial counts), then a filter on the aggregated (class-sized, not
    * row-sized) frame — the violating tail is the only output. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, "k < 2 makes every class compliant by definition")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** Per-class distinct-sensitive-value counts that fall below `l` —
    * classes where the sensitive attribute is (nearly) homogeneous, so
    * membership alone discloses it (the homogeneity attack k-anonymity
    * misses). Returns (quasiCols…, class_size, distinct_sensitive) for
    * each violating class. Null sensitive values count as one value.
    *
    * 100 TB shape: one aggregation with a distinct-count — Spark plans
    * count(DISTINCT x) as a two-phase partial-agg expand, never a
    * per-class collect. */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot also be a quasi-identifier")
    require(l >= 2, "l < 2 makes every class compliant by definition")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        (countDistinct(col(sensitiveCol)) +
          max(when(col(sensitiveCol).isNull, 1).otherwise(0)))
          .as("distinct_sensitive"))
      .filter(col("distinct_sensitive") < l)
  }

  /** Summary of a table's anonymity posture in ONE row: total rows,
    * class count, minimum class size (the table's actual k), rows in
    * classes below `k`, and the share of rows at risk as an exact
    * DECIMAL — the number a release gate thresholds on. */
  def kAnonymitySummary(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, "k < 2 makes every class compliant by definition")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("cs"))
      .agg(sum("cs").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min("cs").as("min_class_size"),
        coalesce(sum(when(col("cs") < k, col("cs"))), lit(0L))
          .as("rows_at_risk"))
      .withColumn("at_risk_permille",
        expr("(rows_at_risk * 1000) div n_rows"))
  }

  /** PII inventory: the audit complement of `TextStats.scrubPII` — the
    * scrubber removes PII, this measures how much there is and where,
    * per `groupCol` (source, domain, snapshot): document counts and
    * total occurrence counts per PII type (URL / email / phone, the
    * same public regexes the scrubber masks), the affected-document
    * count, and its exact integer permille — the release-gate number.
    * Each pattern is counted on the RAW text independently (an email
    * inside a URL counts as both; scrub order doesn't bias the audit).
    *
    * Scale shape: per-row codegen'd regexp_count kernels feeding ONE
    * hash aggregation keyed by the group — no explode, no joins; output
    * is one row per group. */
  def piiInventory(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val urls = regexp_count(t, lit(TextStats.UrlRe))
    val emails = regexp_count(t, lit(TextStats.EmailRe))
    val phones = regexp_count(t, lit(TextStats.PhoneRe))
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(urls).cast("long").as("n_urls"),
        sum(emails).cast("long").as("n_emails"),
        sum(phones).cast("long").as("n_phones"),
        sum(when(urls > 0, 1L).otherwise(0L)).as("docs_with_url"),
        sum(when(emails > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(when(phones > 0, 1L).otherwise(0L)).as("docs_with_phone"),
        sum(when(urls + emails + phones > 0, 1L).otherwise(0L))
          .as("docs_with_pii"))
      .withColumn("pii_docs_permille",
        expr("(docs_with_pii * 1000) div n_docs"))
  }

  /** License/compliance marker detection over a text corpus — the legal
    * sibling of [[piiInventory]]: which documents carry recognizable
    * license declarations (permissive, copyleft, CC, all-rights-
    * reserved), so a training-data mix can include/exclude by license
    * posture BEFORE anything trains on it. Detection is case-folded
    * substring matching against the canonical marker phrases —
    * deliberately not regex (the phrases are fixed strings; `contains`
    * is codegen'd and any engine reproduces it), documented as a
    * marker scan, not legal review. A document carrying several
    * markers counts once per family (a dual-licensed file IS both).
    *
    * Output: one row per family with document count and exact integer
    * permille, plus an `unmarked` row for documents carrying no marker.
    * Scale shape: per-row codegen'd contains kernels into ONE
    * fixed-width aggregation — no explode, no joins, |families|+1 rows
    * out regardless of corpus size. */
  def licenseInventory(df: DataFrame, textCol: String): DataFrame = {
    val t = lower(coalesce(col(textCol), lit("")))
    val families: Seq[(String, Seq[String])] = Seq(
      "mit" -> Seq("mit license"),
      "apache" -> Seq("apache license"),
      "gpl" -> Seq("gnu general public license", "gpl-2.0", "gpl-3.0"),
      "bsd" -> Seq("bsd license", "bsd 3-clause", "bsd 2-clause"),
      "creative_commons" -> Seq("creative commons", "cc by", "cc0"),
      "public_domain" -> Seq("public domain"),
      "all_rights_reserved" -> Seq("all rights reserved"))
    val flags = families.map { case (fam, markers) =>
      fam -> markers.map(m => t.contains(lit(m))).reduce(_ || _)
    }
    val agg = df.agg(
      count(lit(1)).as("n_docs"),
      (flags.map { case (fam, f) =>
        sum(when(f, 1L).otherwise(0L)).as(s"__$fam")
      } :+ sum(when(flags.map(_._2).reduce(_ || _), 0L).otherwise(1L))
        .as("__unmarked")): _*)
    val names = families.map(_._1) :+ "unmarked"
    agg.select(col("n_docs"),
        explode(map(names.flatMap(n =>
          Seq(lit(n), col(s"__$n"))): _*)).as(Seq("license", "n_docs_with")))
      .select(col("license"), col("n_docs_with"),
        expr("(n_docs_with * 1000) div n_docs").as("docs_permille"))
  }

  /** Group fairness audit of a binary classifier — demographic parity
    * (per-group selection rate) and equalized odds (per-group TPR/FPR;
    * Hardt, Price & Srebro NeurIPS '16) — the governance report next to
    * k-anonymity/PII when a quality or routing model gates content by
    * group-correlated features. ONE hash aggregation into the bounded
    * \|groups\| frame; every rate is an exact integer permille; groups
    * with no positives (TPR undefined) or no negatives (FPR undefined)
    * report NULL for that rate rather than a fabricated number. Reading
    * the report: selection-rate spread across groups is the parity gap;
    * TPR/FPR spreads are the equalized-odds gaps. */
  def fairnessAudit(df: DataFrame, groupCol: String, labelCol: Column,
      predCol: Column): DataFrame =
    df.filter(col(groupCol).isNotNull && labelCol.isNotNull &&
        predCol.isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(predCol.cast("long")).as("__sel"),
        sum((labelCol.cast("boolean") && predCol.cast("boolean"))
          .cast("long")).as("__tp"),
        sum(labelCol.cast("long")).as("__pos"),
        sum((!labelCol.cast("boolean") && predCol.cast("boolean"))
          .cast("long")).as("__fp"))
      .select(col("grp"), col("n"),
        expr("(__sel * 1000) div n").as("sel_permille"),
        when(col("__pos") > 0, expr("(__tp * 1000) div __pos"))
          .as("tpr_permille"),
        when(col("n") - col("__pos") > 0,
          expr("(__fp * 1000) div (n - __pos)")).as("fpr_permille"))
}

package graft.lakehouse.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a positional inverted index — the
  * index-once / query-many IR shape ([[TextStats.bm25TopK]] is the
  * bag-of-words ranker; this answers ORDERED multi-token queries
  * exactly). The index is built with ONE shuffle of the token stream;
  * each phrase batch answers through broadcast joins against the tiny
  * phrase table plus per-document array algebra — the corpus text is
  * never rescanned.
  */
object Search {

  /** Positional inverted index over lowercase whitespace tokens: one row
    * per (token, doc) holding the ascending 1-based positions of the
    * token within the document's FILTERED token sequence (empties
    * dropped, positions re-ranked — the same numbering every oracle
    * formulation uses). One groupBy shuffle of (token, doc, pos)
    * triples; postings are per-(token, doc), so no single row exceeds a
    * document's own length. */
  def positionalIndex(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol),
        posexplode(filter(split(lower(col(textCol)), "\\s+"),
          w => w =!= "")).as(Seq("pos0", "w")))
      .groupBy("w", idCol)
      .agg(sort_array(collect_list(col("pos0") + 1)).as("positions"))

  /** Incremental index maintenance: fold a batch of new or RE-INGESTED
    * documents into an existing positional index — old postings for the
    * batch's doc ids are retired (anti join on the id), fresh postings
    * union in. Only the BATCH is tokenized; the standing corpus is
    * never re-read. The anti join co-partitions the index on the doc
    * id — store the index bucketed by id and the retire step prunes to
    * the touched buckets with zero shuffle; either way the cost is
    * O(index scan + batch), never O(corpus re-tokenize). Equality with
    * a from-scratch rebuild over the effective corpus is spec-asserted. */
  def updatePositionalIndex(index: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val ids = newDocs.select(col(idCol)).distinct()
    index.join(ids, Seq(idCol), "left_anti")
      .unionByName(positionalIndex(newDocs, idCol, textCol)
        .select(index.columns.map(col): _*))
  }

  /** Exact occurrence counts of each phrase in each document, answered
    * FROM the index: a document matches a k-token phrase at start s iff
    * token_j sits at position s + j for every offset j — computed as the
    * intersection of each offset's position set shifted back by its
    * offset. Only documents containing every phrase token reach the
    * array algebra; documents with zero matches are dropped. Output:
    * (phrase, idCol, n_matches), one row per matching document. */
  def phraseMatches(index: DataFrame, idCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "need at least one phrase")
    val spark = index.sparkSession
    import spark.implicits._
    val rows = phrases.flatMap { p =>
      val toks = p.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      require(toks.nonEmpty, s"empty phrase: '$p'")
      toks.zipWithIndex.map { case (t, k) => (p, t, k) }
    }
    val phraseDf = rows.toDF("phrase", "w", "off")
    val lenDf = phrases.map(p =>
      p -> p.toLowerCase.trim.split("\\s+").count(_.nonEmpty))
      .toDF("phrase", "n_toks")
    index
      .join(broadcast(phraseDf), "w")
      .groupBy("phrase", idCol)
      .agg(count(lit(1)).as("n_present"),
        sort_array(collect_list(struct(col("off"), col("positions"))))
          .as("parts"))
      .join(broadcast(lenDf), "phrase")
      .filter(col("n_present") === col("n_toks"))
      .withColumn("starts", expr(
        """aggregate(
          |  slice(parts, 2, size(parts) - 1),
          |  transform(parts[0].positions, x -> x - parts[0].off),
          |  (acc, p) -> array_intersect(acc,
          |    transform(p.positions, x -> x - p.off)))""".stripMargin))
      .withColumn("n_matches", size(col("starts")).cast("long"))
      .filter(col("n_matches") > 0)
      .select(col("phrase"), col(idCol), col("n_matches"))
  }
}

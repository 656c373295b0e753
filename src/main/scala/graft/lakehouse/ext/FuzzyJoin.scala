package graft.lakehouse.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded edit-distance joins without the cross product.
  *
  * The reference's fuzzy machinery (`common.py:568-580`
  * `are_strings_similar`) compares ONE pair at a time; finding all
  * similar pairs that way is O(V²) comparisons. This is the
  * corpus-scale re-expression for edit distance 1: the SymSpell
  * deletion-neighborhood index (Garbe 2012, public domain algorithm) —
  * two strings are within one edit iff they share a member of
  * {s} ∪ {s with one character deleted}, so candidate generation is an
  * equi-join on a key space of O(V · len), never a nested loop, and the
  * exact `levenshtein` check runs only on candidates.
  */
object FuzzyJoin {

  /** All distinct corpus-token pairs at Levenshtein distance EXACTLY 1
    * (typo candidates: a rare token one edit from a frequent one is
    * almost always a misspelling), with both tokens' corpus frequencies
    * for that triage. Deletion variants are generated with codegen'd
    * array built-ins; completeness for distance 1 is a theorem
    * (substitution: both sides delete the same position; insert/delete:
    * the longer side's deletion equals the shorter side itself), and the
    * final `levenshtein(a, b) = 1` filter makes precision exact.
    *
    * Scale shape: one token aggregation (map-side combined, O(vocab)
    * exchange), one variant explode O(vocab · len), one equi-join on the
    * variant key, distinct, then the levenshtein check on surviving
    * candidates only. Nothing is quadratic in the vocabulary. */
  def editDistanceOnePairs(df: DataFrame, textCol: String): DataFrame = {
    val toks = df.select(explode(expr(
      s"filter(split(lower(trim(coalesce(`$textCol`, ''))), '\\\\s+'), " +
        "t -> t <> '')")).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("n"))
    val variants = vocab.select(col("term"), col("n"), explode(array_union(
      array(col("term")),
      expr("transform(sequence(1, length(term)), i -> " +
        "concat(substring(term, 1, i - 1), " +
        "substring(term, i + 1, length(term) - i)))"))).as("v"))
    val x = variants.select(col("term").as("a"), col("n").as("n_a"), col("v"))
    val y = variants.select(col("term").as("b"), col("n").as("n_b"), col("v"))
    x.join(y, "v").where(col("a") < col("b"))
      .select("a", "b", "n_a", "n_b").distinct()
      .where(levenshtein(col("a"), col("b")) === 1)
  }
}

package graft.lakehouse

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{lower, trim, udf}

/** String normalization surface of the reference library, re-expressed as
  * pure Scala functions + Spark Scala UDFs (JVM-native — no Python-worker
  * round trip, unlike the reference's five Python UDFs).
  *
  * Reference: ecu/sbl/aace/datalake/common.py:554-724 (are_strings_similar,
  * fixDodgyThing, custom_initcap, fixUpName, garbageCLO, fixDodgyStatuses,
  * fixDodgyAssessLevel and their `F.udf` registrations).
  */
object Strings {

  /** Ratcliff–Obershelp gestalt similarity, matching CPython difflib's
    * `SequenceMatcher(None, a, b).ratio()` for inputs shorter than the
    * autojunk threshold (200 chars — the reference only ever compares short
    * status/level strings). Reference: common.py:554-564.
    *
    * ratio = 2*M / (|a|+|b|), M = total size of matching blocks found by
    * recursively locating the longest matching block (earliest-in-a, then
    * earliest-in-b tie-break), then recursing left and right of it.
    */
  def sequenceRatio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 1.0
    2.0 * totalMatchingChars(a, b) / total
  }

  private def totalMatchingChars(a: String, b: String): Int = {
    // positions of each char in b (difflib's b2j)
    val b2j = new java.util.HashMap[Char, java.util.ArrayList[Int]]()
    var j = 0
    while (j < b.length) {
      b2j.computeIfAbsent(b.charAt(j), _ => new java.util.ArrayList[Int]()).add(j)
      j += 1
    }

    // difflib find_longest_match (junk-free): longest block in
    // a[alo,ahi) x b[blo,bhi); ties broken by smallest i then smallest j.
    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = new java.util.HashMap[Int, Int]()
      var i = alo
      while (i < ahi) {
        val newj2len = new java.util.HashMap[Int, Int]()
        val js = b2j.get(a.charAt(i))
        if (js != null) {
          val it = js.iterator()
          var done = false
          while (it.hasNext && !done) {
            val jj = it.next()
            if (jj >= blo) {
              if (jj >= bhi) done = true
              else {
                val k = j2len.getOrDefault(jj - 1, 0) + 1
                newj2len.put(jj, k)
                if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
              }
            }
          }
        }
        j2len = newj2len
        i += 1
      }
      (besti, bestj, bestsize)
    }

    def recurse(alo: Int, ahi: Int, blo: Int, bhi: Int): Int = {
      if (alo >= ahi || blo >= bhi) 0
      else {
        val (i, jm, k) = longestMatch(alo, ahi, blo, bhi)
        if (k == 0) 0
        else recurse(alo, i, blo, jm) + k + recurse(i + k, ahi, jm + k, bhi)
      }
    }
    recurse(0, a.length, 0, b.length)
  }

  /** common.py:554-564 — similarity >= threshold (default 0.6). */
  def areStringsSimilar(a: String, b: String, threshold: Double = 0.6): Boolean =
    sequenceRatio(a, b) >= threshold

  /** Python `str.title()` semantics (NOT Spark `initcap`): a new word starts
    * after any non-letter, so "o'neil" → "O'Neil", "abc3de" → "Abc3De".
    * Reference relies on this at common.py:579. */
  def pythonTitle(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevIsLetter = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        sb.append(if (prevIsLetter) Character.toLowerCase(c) else Character.toTitleCase(c))
        prevIsLetter = true
      } else {
        sb.append(c)
        prevIsLetter = false
      }
      i += 1
    }
    sb.toString
  }

  /** Python `str.capitalize()`: first char title-cased, rest lower-cased. */
  private def pythonCapitalize(s: String): String =
    if (s.isEmpty) s
    else s"${Character.toTitleCase(s.charAt(0))}${s.substring(1).toLowerCase}"

  private val InitcapDelimiters = Set(" ", "'", "-", "`", "/")

  /** common.py:631-661 — init-cap splitting on the five delimiters, keeping
    * them; mixed-case words (McDonald) preserved; particles de/of lowered;
    * null-safe (null → null). */
  def customInitcap(name: String): String = {
    if (name == null || name.isEmpty) return null
    // split keeping delimiters (re.split with a capturing group)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder()
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (InitcapDelimiters.contains(c.toString)) {
        parts += cur.toString; cur.setLength(0)
        parts += c.toString
      } else cur.append(c)
      i += 1
    }
    parts += cur.toString
    def isMixedCase(s: String) = s.exists(Character.isUpperCase) && s.exists(Character.isLowerCase)
    parts.map { p =>
      if (InitcapDelimiters.contains(p)) p
      else if (isMixedCase(p)) p
      else if (p.toLowerCase == "de" || p.toLowerCase == "of") p.toLowerCase
      else pythonCapitalize(p)
    }.mkString
  }

  /** common.py:672-684 — person-name fix-up: customInitcap → strip from the
    * first '(' → "Last, First" → "First Last"; lone "," → null. */
  def fixUpName(name: String): String = {
    if (name == null || name.isEmpty) return name
    if (name.trim == ",") return null
    var n = customInitcap(name)
    n = n.split("\\(", 2)(0).trim
    if (n.contains(","))
      n = n.split(",", -1).reverse.map(_.trim).mkString(" ")
    n
  }

  /** common.py:695-700 — true if null or 'n/a' (case/space-insensitive). */
  def garbageCLO(v: String): Boolean =
    v == null || v.isEmpty || v.toLowerCase.trim == "n/a"

  /** Column-level garbageCLO using pure built-ins (codegen-friendly —
    * no UDF needed, unlike the reference's garbageCLO_udf). */
  def garbageCLOCol(c: Column): Column =
    c.isNull || (c === "") || (lower(trim(c)) === "n/a")

  /** common.py:572-585 — canonicalize a value: falsy → "None Supplied",
    * Python-title-case, then snap to the first legit value with
    * Ratcliff–Obershelp similarity >= 0.6. */
  def fixDodgyThing(value: String, legitValues: Seq[String]): String = {
    var v = if (value == null || value.isEmpty) "None Supplied" else value
    v = pythonTitle(v)
    if (legitValues.nonEmpty && !legitValues.contains(v))
      legitValues.find(l => areStringsSimilar(v, l)).getOrElse(v)
    else v
  }

  /** common.py:708-712 */
  def fixDodgyStatuses(status: String): String =
    fixDodgyThing(status, Seq("Completed", "Discontinued", "Enrolled"))

  /** common.py:720-724 */
  def fixDodgyAssessLevel(level: String): String =
    fixDodgyThing(level, Seq("Consolidated", "Demonstrated"))

  // ---- UDF surface (Scala UDFs: JVM-native, codegen-adjacent) ----
  val customInitcapUdf = udf[String, String](customInitcap _)
  val fixUpNameUdf = udf[String, String](fixUpName _)
  val garbageCLOUdf = udf[Boolean, String](garbageCLO _)
  val fixDodgyStatusesUdf = udf[String, String](fixDodgyStatuses _)
  val fixDodgyAssessLevelUdf = udf[String, String](fixDodgyAssessLevel _)
  val sequenceRatioUdf =
    // null-safe like every sibling UDF: similarity with an absent string
    // is undefined — surface SQL NULL, not an executor NPE
    udf[java.lang.Double, String, String]((a, b) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(sequenceRatio(a, b)))

  /** Register the UDF surface for SQL use (spark.sql("custom_initcap(c)")). */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("custom_initcap", customInitcapUdf)
    spark.udf.register("fix_up_name", fixUpNameUdf)
    spark.udf.register("garbage_clo", garbageCLOUdf)
    spark.udf.register("fix_dodgy_statuses", fixDodgyStatusesUdf)
    spark.udf.register("fix_dodgy_assess_level", fixDodgyAssessLevelUdf)
    spark.udf.register("sequence_ratio", sequenceRatioUdf)
  }
}

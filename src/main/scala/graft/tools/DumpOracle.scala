package graft.tools

import java.nio.file.{Files, Paths}

/** Dev-only: dump SparkEntry.oracleSql to a JSON file (no Spark session)
  * so local DuckDB timing runs can read the oracle queries directly. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    val json = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).map {
      case (k, v) =>
        val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\t", "\\t")
        s""""$k": "$esc""""
    }.mkString("{", ",\n", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle SQLs to $out")
  }
}

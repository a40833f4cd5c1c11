package graft

import java.nio.file.{Files, Paths}

/** Dev helper: write SparkEntry.oracleSql to a JSON file without
 * touching Spark (fast oracle-SQL iteration against DuckDB). */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args.headOption.getOrElse("/tmp/oracle_sql.json")), json)
  }
}

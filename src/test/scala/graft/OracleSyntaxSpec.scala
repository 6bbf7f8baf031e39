package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** Self-oracle guard (SURVEY.md §5.4): every declared oracle must at least
  * PLAN in DuckDB against the real corpus — catching syntax drift, bad
  * function names, and type errors before the driver's graded run does.
  * (Value-level parity is tools/selfcheck.py's job.) */
class OracleSyntaxSpec extends AnyFunSuite {

  test("every oracle SQL statement plans in DuckDB") {
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val esc = v.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        }
        s""""$k": "$esc""""
      }
      .mkString("{", ",", "}")
    val tmp = Files.createTempFile("oracles", ".json")
    Files.writeString(tmp, json)
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/oracle_explain.py", "/root/testdata/sf0.001", tmp.toString))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle drift detected:\n$out")
    assert(out.toString.contains(s"${SparkEntry.oracleSql.size}/${SparkEntry.oracleSql.size} oracles plan cleanly"))
  }
}

package graft.core

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite
import graft.core.macros.{AssetCompiler, TemplateCompiler}

/** Goldens from the reference's `compiler.go` semantics and the
  * CompileAssets multi-slice output in `main_test.go:213-257`.
  */
class TemplateCompilerSpec extends AnyFunSuite {

  test("renders {{.DSTART}} and Date filter") {
    val out = TemplateCompiler.compileOne(
      """Select * from table where ts > "{{.DSTART}}" and d = '{{ .DSTART | Date }}'""",
      Map("DSTART" -> "2021-01-10T00:00:00Z"))
    assert(out == """Select * from table where ts > "2021-01-10T00:00:00Z" and d = '2021-01-10'""")
  }

  test("trims surrounding whitespace like Go strings.TrimSpace") {
    assert(TemplateCompiler.compileOne("  x {{.A}}  \n", Map("A" -> "1")) == "x 1")
  }

  test("CompileAssets: non-REPLACE load method leaves assets unchanged") {
    val assets = Map("query.sql" -> """Select * from table where ts > "{{.DSTART}}"""")
    val out = AssetCompiler.compileAssets("MERGE", assets, Map(),
      LocalDateTime.of(2022, 5, 1, 0, 0), LocalDateTime.of(2022, 5, 2, 0, 0))
    assert(out == assets)
  }

  test("CompileAssets: window <= 1 day leaves assets unchanged") {
    val assets = Map("query.sql" -> """Select * from table where ts > "{{.DSTART}}"""")
    val out = AssetCompiler.compileAssets("REPLACE", assets, Map(),
      LocalDateTime.of(2022, 5, 1, 0, 0), LocalDateTime.of(2022, 5, 2, 0, 0))
    assert(out == assets)
  }

  test("CompileAssets: 7-day REPLACE window → 7 slices with break markers") {
    val assets = Map("query.sql" -> """Select * from table where ts > "{{.DSTART}}"""")
    val out = AssetCompiler.compileAssets("REPLACE", assets, Map(),
      LocalDateTime.of(2021, 1, 10, 0, 0), LocalDateTime.of(2021, 1, 17, 0, 0))
    val expected =
      """Select * from table where ts > "2021-01-10T00:00:00Z"
        |--*--optimus-break-marker--*--
        |Select * from table where ts > "2021-01-11T00:00:00Z"
        |--*--optimus-break-marker--*--
        |Select * from table where ts > "2021-01-12T00:00:00Z"
        |--*--optimus-break-marker--*--
        |Select * from table where ts > "2021-01-13T00:00:00Z"
        |--*--optimus-break-marker--*--
        |Select * from table where ts > "2021-01-14T00:00:00Z"
        |--*--optimus-break-marker--*--
        |Select * from table where ts > "2021-01-15T00:00:00Z"
        |--*--optimus-break-marker--*--
        |Select * from table where ts > "2021-01-16T00:00:00Z"""".stripMargin
    assert(out("query.sql") == expected)
  }

  test("splitOnMarker inverts the join") {
    val sql = "q1\n--*--optimus-break-marker--*--\nq2\n--*--optimus-break-marker--*--\nq3"
    assert(AssetCompiler.splitOnMarker(sql) == Seq("q1", "q2", "q3"))
  }
}

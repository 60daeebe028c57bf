package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 item 4: COVERAGE.md is the SURVEY §2 -> implementation map, and
  * the r4 round shipped one query (`readability`) without a row. This pins the
  * class: every driver-surface query name must appear in COVERAGE.md, so a new
  * operator cannot ship unmapped again.
  */
class CoverageSpec extends AnyFunSuite {

  test("every SparkEntry.queries key appears in COVERAGE.md") {
    val md = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val missing = SparkEntry.queries.keys.toSeq.sorted.filterNot(md.contains)
    assert(missing.isEmpty, s"queries missing from COVERAGE.md: ${missing.mkString(", ")}")
  }
}

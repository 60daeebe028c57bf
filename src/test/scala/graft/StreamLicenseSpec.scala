package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stateless streaming license gate: drained table == batch answer. */
class StreamLicenseSpec extends AnyFunSuite {
  import SparkSuite._

  test("drained stream_license_detect equals the batch license_detect answer") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    val batch = rows(SparkEntry.queries("license_detect")(spark, sf))
    val stream = rows(SparkEntry.queries("stream_license_detect")(spark, sf))
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}

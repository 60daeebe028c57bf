package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stream-static decontamination twin: stateless, so the drained table must
  * equal the batch answer bit-for-bit under any micro-batching. */
class StreamDecontaminateSpec extends AnyFunSuite {
  import SparkSuite._

  test("drained stream_decontaminate equals the batch decontaminate answer") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val batch = rows(SparkEntry.queries("decontaminate")(spark, sf))
    val stream = rows(SparkEntry.queries("stream_decontaminate")(spark, sf))
    assert(stream == batch)
    assert(stream.exists(_._4), "fixture must contain contaminated docs")
    assert(stream.exists(!_._4), "fixture must contain clean docs")
  }
}

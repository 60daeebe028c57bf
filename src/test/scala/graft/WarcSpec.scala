package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.webtext.{HtmlGen, Warc}
import java.nio.charset.StandardCharsets.UTF_8

class WarcSpec extends AnyFunSuite {

  private def words(n: Int): String = (1 to n).map("word" + _).mkString(" ")

  test("record/parseSegment round-trip: urls, dates, lengths, payload bytes") {
    val payloads = (0L until 20L).map { id =>
      (id, HtmlGen.page(id, words(10 + (id % 37).toInt * 3)).getBytes(UTF_8))
    }
    val blob = payloads.flatMap { case (id, p) =>
      Warc.record(s"doc://$id", id * 3600 * 1000L, p)
    }.toArray
    val recs = Warc.parseSegment(7L, blob)
    assert(recs.length == payloads.length)
    recs.zip(payloads).foreach { case (r, (id, p)) =>
      assert(r.segment_id == 7L)
      assert(r.url == s"doc://$id")
      assert(r.warc_date == Warc.warcDate(id * 3600 * 1000L))
      assert(r.content_length == p.length)
      assert(java.util.Arrays.equals(r.html, p))
    }
    // the date render is UTC field arithmetic, independent of JVM default TZ
    assert(Warc.warcDate(17L * 3600 * 1000L) == "1970-01-01T17:00:00Z")
  }

  test("corrupt tails drop the damaged record and stop; garbage yields nothing") {
    val ps = (0L until 3L).map(id => Warc.record(s"doc://$id", id, s"<p>p$id</p>".getBytes(UTF_8)))
    val blob = ps.flatten.toArray
    // truncated mid-payload of the last record: two survive
    assert(Warc.parseSegment(0L, blob.dropRight(6)).length == 2)
    // header never completes: everything before survives
    assert(Warc.parseSegment(0L, (ps(0) ++ "WARC/1.0\r\nWARC-".getBytes(UTF_8)).toArray).length == 1)
    // bad Content-Length stops the walk without throwing
    val bad = new String(ps(1), UTF_8).replace("Content-Length: 9", "Content-Length: xx")
    assert(bad != new String(ps(1), UTF_8)) // the corruption actually landed
    assert(Warc.parseSegment(0L, (ps(0) ++ bad.getBytes(UTF_8) ++ ps(2)).toArray).length == 1)
    assert(Warc.parseSegment(0L, "no warc here at all".getBytes(UTF_8)).isEmpty)
    assert(Warc.parseSegment(0L, Array.empty[Byte]).isEmpty)
  }

  test("payload containing the WARC magic cannot desync the walk (length-skipped)") {
    val evil = "before WARC/1.0\r\nWARC-Target-URI: doc://999\r\n after".getBytes(UTF_8)
    val blob = (Warc.record("doc://1", 1000L, evil) ++
      Warc.record("doc://2", 2000L, "<p>x</p>".getBytes(UTF_8))).toArray
    val recs = Warc.parseSegment(0L, blob)
    assert(recs.map(_.url) == Vector("doc://1", "doc://2"))
    assert(java.util.Arrays.equals(recs(0).html, evil))
  }

  test("warc_extract equals html_main_content row-for-row (the ingestion edge is lossless)") {
    import SparkSuite._
    def rows(name: String) = SparkEntry.queries(name)(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val direct = rows("html_main_content")
    val viaWarc = rows("warc_extract")
    assert(viaWarc == direct)
    // segment audit: contiguous ids, 16 per segment except the ragged tail
    val stats = SparkEntry.queries("warc_stats")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = direct.size
    assert(stats.values.sum == n)
    assert(stats.keySet == (0L until ((n + 15) / 16).toLong).toSet)
  }

  test("WET conversion: records carry the extracted text, conversion type, and the source date") {
    import SparkSuite._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val segs = Warc.segmentsFromDocuments(docs)
    val wet = Warc.wetSegments(segs)
    // segment blobs are marked as conversions and shed the HTML chrome
    val blob = new String(wet.orderBy("segment_id").limit(1)
      .collect()(0).getAs[Array[Byte]]("wet"), UTF_8)
    assert(blob.contains("WARC-Type: conversion") && !blob.contains("WARC-Type: response"))
    assert(!blob.contains("<html") && !blob.contains("<nav"))
    // read-back equals the direct extraction, dates copied from the response
    val got = Warc.wetParse(wet).collect()
      .map(r => r.url -> ((r.warc_date, r.content_length, r.extracted_text))).toMap
    val direct = SparkEntry.queries("html_main_content")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == direct.size)
    direct.foreach { case (url, text) =>
      val (d, cl, t) = got(url)
      assert(t == text, s"$url text")
      assert(cl == text.getBytes(UTF_8).length.toLong, s"$url length")
      val id = url.stripPrefix("doc://").toLong
      assert(d == Warc.warcDate(id * 3600 * 1000L), s"$url date")
    }
    // WET is smaller than WARC (that's its reason to exist)
    val warcBytes = segs.collect().map(_.getAs[Array[Byte]]("warc").length.toLong).sum
    val wetBytes = wet.collect().map(_.getAs[Array[Byte]]("wet").length.toLong).sum
    assert(wetBytes < warcBytes)
  }
}

class CdxSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.Warc

  test("range-read identity: blob slice at every (offset, length) reparses to exactly that record; offsets tile") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(40)
    val segs = Warc.segmentsFromDocuments(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("warc")).toMap
    val cdx = Warc.cdxIndex(Warc.segmentsFromDocuments(docs)).collect()
    assert(cdx.length == 40)
    cdx.groupBy(_.segment_id).foreach { case (seg, rows) =>
      val blob = segs(seg)
      val sorted = rows.sortBy(_.rec_ord)
      // offsets tile the blob: consecutive, starting at 0, ending at length
      assert(sorted.head.rec_offset == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.rec_offset == a.rec_offset + a.rec_length)
        case _ => ()
      }
      assert(sorted.last.rec_offset + sorted.last.rec_length == blob.length)
      sorted.foreach { r =>
        val slice = java.util.Arrays.copyOfRange(blob,
          r.rec_offset.toInt, (r.rec_offset + r.rec_length).toInt)
        val recs = Warc.parseSegment(seg, slice)
        assert(recs.length == 1 && recs.head.url == r.url &&
          recs.head.content_length == r.content_length &&
          recs.head.warc_date == r.warc_date)
      }
    }
  }

  test("damaged segment: indexing stops at the damage, like parseSegment") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(16)
    val blob = Warc.segmentsFromDocuments(docs).collect()
      .map(r => r.getAs[Array[Byte]]("warc")).head
    val rows = Warc.indexSegment(0L, blob)
    assert(rows.length == 16)
    val cut = java.util.Arrays.copyOfRange(blob, 0, rows(3).rec_offset.toInt + 10)
    assert(Warc.indexSegment(0L, cut).length == 3)
    val corrupt = cut.clone(); corrupt(rows(2).rec_offset.toInt) = 'X'
    assert(Warc.indexSegment(0L, corrupt).length == 2)
  }
}

package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media carried as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in BATCHES inside `mapPartitions`
  * (the JVM-side shape of a batched decode UDF: schema, partitioning and batch
  * size are real; the decode itself is a clearly-marked deterministic STUB —
  * image/audio codecs are not in this container).
  */
object Multimodal {

  /** One media row: payload is opaque bytes + typed metadata struct fields. */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            meta_width: Int, meta_height: Int)

  final case class MediaFeatures(doc_id: Long, kind: String, byte_len: Long,
                                 sum_bytes: Long, max_byte: Int)

  val BatchSize = 32

  /** Lift documents into media rows: the text's UTF-8 bytes stand in for an
    * encoded image payload (deterministic fake). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, t) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      MediaRow(id, "fake-image", bytes, meta_width = bytes.length, meta_height = 1)
    }
  }

  /** ==== DECODE STUB ====
    * A real deployment would decode the image/audio payload here (per batch,
    * reusing a decoder instance). This container has no media libs, so the
    * "decoder" computes deterministic byte statistics with the same
    * batch-iteration shape. */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      var sum = 0L
      var max = 0
      var i = 0
      while (i < m.payload.length) {
        val b = m.payload(i) & 0xff
        sum += b
        if (b > max) max = b
        i += 1
      }
      MediaFeatures(m.doc_id, m.kind, m.payload.length.toLong, sum, max)
    }

  /** Batched feature extraction over partitions (mapInPandas-shaped). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
  }

  /** ==== RESIZE STUB ==== A real implementation would decode + rescale the
    * image; the stub keeps every `stride`-th byte, preserving the payload
    * schema so downstream plumbing (metadata update included) is real. */
  def resize(media: Dataset[MediaRow], stride: Int = 4): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      // ceil division: every stride-th byte INCLUDING the tail remainder's
      // first byte (floor would silently drop it for non-multiple lengths)
      val out = Array.tabulate((m.payload.length + stride - 1) / stride)(i => m.payload(i * stride))
      m.copy(payload = out, meta_width = out.length)
    })
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** ==== FRAME-SAMPLE STUB ==== For video-like payloads: split the payload
    * into fixed-size "frames" and keep every `everyK`-th one (explode to frame
    * grain — the real op's schema and fan-out shape). */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64, everyK: Int = 2): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (f, i) if i % everyK == 0 => Frame(m.doc_id, i, f)
      }
    }
  }
}

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

  // ---- REAL header decode (no codecs needed) --------------------------------

  final case class MediaDims(doc_id: Long, format: String, width: Int, height: Int)

  /** Container-format header parse — REAL decoding, not a stub: PNG IHDR,
    * JPEG SOF0/1/2 (and the other SOFn except DHT/JPG/DAC), GIF logical
    * screen descriptor, BMP info header. Pixel decode still needs codecs (see
    * the stub below); dimensions/format don't, and they are what a corpus
    * pipeline filters on (min-resolution gates, aspect-ratio gates) before
    * paying for any pixel work. Returns None for unrecognized payloads. */
  def imageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        b.length >= 12 + 4 && new String(b, 12, 4, "US-ASCII") == "IHDR")
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
             (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      // negative biHeight only encodes top-down row order on valid BMPs;
      // abs via Long so biHeight = Int.MinValue can't stay negative, and
      // non-positive dims are rejected as corrupt rather than passed on
      val w = le32(18)
      val h = math.abs(le32(22).toLong)
      if (w <= 0 || h <= 0 || h > Int.MaxValue) None else Some(("bmp", w, h.toInt))
    }
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first frame header (SOFn)
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return None
        // spec B.1.1.2: any number of 0xff FILL bytes may precede a marker id
        while (i + 1 < b.length && u8(i + 1) == 0xff) i += 1
        if (i + 3 >= b.length) return None
        val m = u8(i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
        else {
          val len = be16(i + 2)
          if (len < 2 || i + 2 + len > b.length) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (len < 7) return None
            return Some(("jpeg", be16(i + 7), be16(i + 5))) // SOF: height then width
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Real header decode over the media table (map-side, zero shuffle). */
  def decodeHeaders(media: Dataset[MediaRow]): Dataset[MediaDims] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      imageHeader(m.payload) match {
        case Some((fmt, w, h)) => MediaDims(m.doc_id, fmt, w, h)
        case None              => MediaDims(m.doc_id, "unknown", -1, -1)
      }
    }
  }

  /** The single source of the generator's dimensions (the SQL oracle is the
    * only other copy, and that one is required by the gate design). */
  def imageDims(docId: Long): (Int, Int) = ((16 + docId % 97).toInt, (16 + docId % 53).toInt)

  /** Deterministic VALID image payload for doc_id: a spec-conformant PNG /
    * JPEG / GIF header (format rotates on doc_id % 3) carrying [[imageDims]],
    * followed by text-derived body bytes. Any standards-based header reader
    * recovers the same dimensions — which is what makes [[decodeHeaders]]
    * oracle-checkable. */
  def imagePayload(docId: Long, text: String): Array[Byte] = {
    val (w, h) = imageDims(docId)
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(64)
    val buf = new java.io.ByteArrayOutputStream(128)
    def be16(v: Int): Unit = { buf.write((v >> 8) & 0xff); buf.write(v & 0xff) }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xffff); be16(v & 0xffff) }
    def le16(v: Int): Unit = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
    (docId % 3) match {
      case 0 => // PNG signature + IHDR
        buf.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
        be32(13); buf.write("IHDR".getBytes("US-ASCII")) // length + type
        be32(w); be32(h)
        buf.write(8); buf.write(2); buf.write(0); buf.write(0); buf.write(0) // depth,color,...
        be32(0) // CRC placeholder (not validated by header readers)
      case 1 => // JPEG: SOI + APP0(JFIF) + SOF0 + (body) — marker walk finds SOF0
        buf.write(0xff); buf.write(0xd8) // SOI
        buf.write(0xff); buf.write(0xe0); be16(16) // APP0, len 16
        buf.write("JFIF".getBytes("US-ASCII")); buf.write(0)
        buf.write(1); buf.write(1); buf.write(0); be16(1); be16(1); buf.write(0); buf.write(0)
        buf.write(0xff); buf.write(0xc0); be16(11) // SOF0, len 11 (1 component)
        buf.write(8); be16(h); be16(w); buf.write(1)
        buf.write(1); buf.write(0x11); buf.write(0)
      case _ => // GIF89a logical screen descriptor
        buf.write("GIF89a".getBytes("US-ASCII"))
        le16(w); le16(h)
        buf.write(0); buf.write(0); buf.write(0)
    }
    buf.write(body, 0, body.length)
    buf.toByteArray
  }

  /** Lift documents into media rows with VALID image headers (see
    * [[imagePayload]]) so the header decode is a real, oracle-checked op. */
  def mediaWithHeaders(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, t) =>
      val bytes = imagePayload(id, if (t == null) "" else t)
      val (w, h) = imageDims(id)
      MediaRow(id, Seq("png", "jpeg", "gif")((id % 3).toInt), bytes,
        meta_width = w, meta_height = h)
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

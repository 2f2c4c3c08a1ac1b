package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** JPEG metadata strip — [[PngMeta]]'s twin for the other container a
  * crawled image corpus actually arrives in. JPEG metadata lives in
  * marker segments BEFORE the entropy-coded scan: APP1 carries
  * Exif/XMP (camera, GPS, timestamps — the PII), APP13 carries
  * Photoshop/IPTC blocks, COM carries free-text comments. The strip
  * policy is the public convention (exiftool's "all but structural"):
  * drop COM and APP1–APP15, keep APP0 (JFIF is structural), keep every
  * codec segment (DQT/SOF/DHT/DRI), and copy the scan (SOS onward)
  * VERBATIM — the compressed pixels are never re-encoded, so stripping
  * is lossless for image content by construction, and `scan_intact`
  * verifies that byte-for-byte in the gate.
  *
  * The walk is REAL marker parsing — FFD8, then (FF, marker,
  * 2-byte big-endian length) frames up to SOS/EOI — over containers a
  * real encoder produced (`javax.imageio`'s JPEG writer) with metadata
  * segments injected at the spec's position (immediately after SOI,
  * where the Exif spec puts APP1). Poison posture (the m-series
  * clamp): a payload that is not a walkable JPEG — wrong signature, a
  * marker byte where none can be, a length running past the buffer, a
  * restart/stuffing marker in the segment stream — costs exactly one
  * dropped row, never a throw (JpegMetaSpec feeds each class).
  *
  * Oracle-exactness is the m9 closed-form posture: the injected
  * segment layout is a deterministic function of doc_id, so DuckDB
  * recomputes the expected segment counts and byte savings from
  * arithmetic while Spark's numbers travelled through real bytes. The
  * gate counts only the injected MARKER set (APP1/APP13/COM — the JDK
  * encoder emits none of them for a grayscale image, only APP0 and
  * codec segments), so encoder-emitted segments shift nothing; the
  * structural invariants (idempotent, scan intact, still decodable)
  * ride as gate booleans.
  *
  * 100 TB shape: encode/inject/strip/verify run `mapPartitions`-local;
  * payload bytes never shuffle — only doc_id-keyed counters leave the
  * executor.
  */
object JpegMeta {

  final case class StripStats(doc_id: Long, n_meta_segments: Int,
      meta_bytes: Long, strip_idempotent: Boolean, scan_intact: Boolean,
      decodes_ok: Boolean)

  /** One marker segment: FF marker, 2-byte length (covers itself +
    * data), data. */
  private[llm] def seg(marker: Int, data: Array[Byte]): Array[Byte] = {
    val len = data.length + 2
    require(len <= 0xFFFF, "segment too long")
    val out = new Array[Byte](4 + data.length)
    out(0) = 0xFF.toByte; out(1) = marker.toByte
    out(2) = (len >>> 8).toByte; out(3) = len.toByte
    System.arraycopy(data, 0, out, 4, data.length)
    out
  }

  /** The deterministic metadata decoration (the m9 layout, JPEG-typed):
    * every doc an APP1 Exif artist (`user-<doc_id>` — size varies with
    * the id's digits), even docs an APP13 Photoshop GPS block, every
    * third doc a COM timestamp. Wire cost is 4 + data length per
    * segment; the oracle restates these sizes in SQL. */
  private[llm] def metaSegments(docId: Long): Seq[Array[Byte]] =
    Seq(seg(0xE1, ("Exif\u0000\u0000Artist=user-" + docId).getBytes("ISO-8859-1"))) ++
      (if (docId % 2 == 0)
        Seq(seg(0xED, "Photoshop 3.0\u0000GPS:47.60,-122.33".getBytes("ISO-8859-1")))
      else Nil) ++
      (if (docId % 3 == 0)
        Seq(seg(0xFE, "ts=2026-08-16".getBytes("ISO-8859-1")))
      else Nil)

  /** Markers the gate counts — injected-only by construction (the JDK
    * JPEG writer emits APP0 + codec segments for grayscale input,
    * never APP1/APP13/COM). */
  private val InjectedMarkers = Set(0xE1, 0xED, 0xFE)

  /** Walk the pre-scan segment stream. Returns (segments as (offset,
    * totalLen, marker)) plus the scan-start offset (the SOS or EOI
    * marker — everything from there copies verbatim); None if the
    * bytes are not a walkable JPEG. A declared length running past the
    * buffer, a non-FF byte where a marker must start, or a marker that
    * cannot appear in the segment stream (SOI again, RSTn, stuffing,
    * TEM) ends the walk as poison, not data. */
  private[llm] def walk(jpg: Array[Byte]): Option[(Seq[(Int, Int, Int)], Int)] = {
    if (jpg.length < 4 || (jpg(0) & 0xFF) != 0xFF || (jpg(1) & 0xFF) != 0xD8)
      return None
    val segs = Seq.newBuilder[(Int, Int, Int)]
    var off = 2
    var res: Option[(Seq[(Int, Int, Int)], Int)] = None
    var done = false
    while (!done) {
      if (off + 2 > jpg.length || (jpg(off) & 0xFF) != 0xFF) { done = true }
      else {
        val m = jpg(off + 1) & 0xFF
        if (m == 0xDA || m == 0xD9) { res = Some((segs.result(), off)); done = true }
        else if (m == 0x00 || m == 0x01 || m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) {
          done = true
        } else if (off + 4 > jpg.length) { done = true }
        else {
          val len = ((jpg(off + 2) & 0xFF) << 8) | (jpg(off + 3) & 0xFF)
          if (len < 2 || off + 2L + len > jpg.length) { done = true }
          else { segs += ((off, 2 + len, m)); off += 2 + len }
        }
      }
    }
    res
  }

  /** Insert metadata segments immediately after SOI (the Exif spec's
    * APP1 position). */
  private[llm] def inject(jpg: Array[Byte], metas: Seq[Array[Byte]]): Option[Array[Byte]] =
    walk(jpg).map { _ =>
      val metaLen = metas.map(_.length).sum
      val out = new Array[Byte](jpg.length + metaLen)
      System.arraycopy(jpg, 0, out, 0, 2)
      var o = 2
      metas.foreach { m => System.arraycopy(m, 0, out, o, m.length); o += m.length }
      System.arraycopy(jpg, 2, out, o, jpg.length - 2)
      out
    }

  /** Drop COM + APP1–APP15; keep APP0 and codec segments verbatim; the
    * scan tail copies untouched. Returns the stripped JPEG plus the
    * dropped (marker, totalBytes) list. */
  private[llm] def strip(jpg: Array[Byte]): Option[(Array[Byte], Seq[(Int, Int)])] =
    walk(jpg).map { case (segs, scanStart) =>
      val (drop, keep) = segs.partition { case (_, _, m) =>
        m == 0xFE || (m >= 0xE1 && m <= 0xEF)
      }
      val tailLen = jpg.length - scanStart
      val out = new Array[Byte](2 + keep.map(_._2).sum + tailLen)
      out(0) = 0xFF.toByte; out(1) = 0xD8.toByte
      var o = 2
      keep.foreach { case (off, len, _) =>
        System.arraycopy(jpg, off, out, o, len); o += len
      }
      System.arraycopy(jpg, scanStart, out, o, tailLen)
      (out, drop.map { case (_, len, m) => (m, len) })
    }

  /** Deterministic grayscale JPEG via the real JDK encoder (the
    * ImagePhash pixel function, JPEG-typed). */
  private[llm] def encodeJpeg(docId: Long): Array[Byte] = {
    val side = ImagePhash.Side
    val img = new BufferedImage(side, side, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) { raster.setSample(x, y, 0, ImagePhash.pixel(docId, 0, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "jpg", bos), "no ImageIO writer for jpg")
    bos.toByteArray
  }

  /** Fixture → inject → strip → verify, all partition-local. */
  def stripStats(documents: DataFrame): Dataset[StripStats] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      ImageIO.setUseCache(false) // in-memory streams (ImagePhash posture)
      ids.flatMap { id =>
        val base = encodeJpeg(id)
        for {
          injected <- inject(base, metaSegments(id))
          (stripped, dropped) <- strip(injected)
          (again, droppedAgain) <- strip(stripped)
          scanInj <- walk(injected).map(_._2)
          scanStr <- walk(stripped).map(_._2)
        } yield {
          val meta = dropped.filter(d => InjectedMarkers(d._1))
          val scanOk =
            injected.length - scanInj == stripped.length - scanStr &&
              java.util.Arrays.equals(
                java.util.Arrays.copyOfRange(injected, scanInj, injected.length),
                java.util.Arrays.copyOfRange(stripped, scanStr, stripped.length))
          val img = ImageIO.read(new ByteArrayInputStream(stripped))
          val decOk = img != null &&
            img.getWidth == ImagePhash.Side && img.getHeight == ImagePhash.Side
          StripStats(id, meta.size, meta.map(_._2.toLong).sum,
            droppedAgain.isEmpty && java.util.Arrays.equals(again, stripped),
            scanOk, decOk)
        }
      }
    }
  }

  /** m10 gate frame. */
  def gate(documents: DataFrame): DataFrame =
    stripStats(documents).toDF()
      .select(col("doc_id"), col("n_meta_segments"), col("meta_bytes"),
        col("strip_idempotent"), col("scan_intact"), col("decodes_ok"))
      .orderBy("doc_id")

  /** Closed-form oracle: wire bytes are 4 + data per segment — APP1
    * data is 6 + 12 + digits(doc_id), APP13 data is 14 + 17, COM data
    * is 13. The booleans are the structural invariants the real walk
    * must land. */
  val oracleSql: String =
    """SELECT doc_id,
        CAST(1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
           + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_meta_segments,
        CAST((4 + 6 + 12 + len(CAST(doc_id AS VARCHAR)))
           + CASE WHEN doc_id % 2 = 0 THEN 4 + 14 + 17 ELSE 0 END
           + CASE WHEN doc_id % 3 = 0 THEN 4 + 13 ELSE 0 END AS BIGINT) AS meta_bytes,
        true AS strip_idempotent,
        true AS scan_intact,
        true AS decodes_ok
      FROM documents ORDER BY doc_id"""
}

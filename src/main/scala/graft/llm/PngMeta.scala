package graft.llm

import java.io.ByteArrayInputStream
import java.util.zip.CRC32

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Metadata scrubbing for the multimodal column — the binary twin of
  * the r1/r2 text PII redaction: image containers routinely carry
  * author, GPS, and timestamp metadata in ancillary chunks, and a
  * training-data pipeline strips them before the bytes enter the
  * corpus. Implemented for PNG, whose public spec makes the policy a
  * one-bit decision: chunk names with an uppercase first letter are
  * critical (IHDR/PLTE/IDAT/IEND — removing them destroys the image),
  * lowercase-first are ancillary (tEXt/zTXt/iTXt/tIME/eXIf — safe to
  * drop, and where the PII lives). The strip walks the chunk stream
  * once and copies critical chunks verbatim (their CRCs stay valid), so
  * the output is a decodable PNG with bit-identical pixels.
  *
  * The walk is REAL byte parsing (8-byte signature, then
  * length/type/data/CRC frames) over containers produced by a real
  * encoder ([[ImagePhash.encodeImage]]'s `javax.imageio` PNGs) with
  * metadata chunks injected CRC-correctly — the full
  * encode→inject→bytes→walk→strip→decode path. Poison posture (the
  * m-series clamp, ImagePhash scaladoc): a payload that is not a
  * walkable PNG — short signature, truncated chunk, length pointing
  * past the buffer — costs exactly one dropped row, never a throw
  * (PngMetaSpec feeds each class).
  *
  * Oracle-exactness uses the m5 closed-form posture: the injected
  * metadata layout is a deterministic function of doc_id, so a DuckDB
  * oracle recomputes the expected chunk counts and byte savings from
  * arithmetic while Spark's numbers travelled through real container
  * bytes; the structural invariants (strip is idempotent, pixels
  * survive) ride along as gate booleans. ImageIO's own emissions are
  * never assumed — the gate counts only the injected ancillary TYPES,
  * so a JDK that writes an extra sRGB chunk shifts nothing.
  *
  * 100 TB shape: inject/strip/verify run `mapPartitions`-local; payload
  * bytes never shuffle (only doc_id-keyed counters leave the executor).
  * The scan partitions by `spark.sql.files.maxPartitionBytes` like any
  * binary column read.
  */
object PngMeta {

  final case class StripStats(doc_id: Long, n_meta_chunks: Int,
      meta_bytes: Long, strip_idempotent: Boolean, pixels_ok: Boolean)

  private val Sig = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** One CRC-correct chunk: length + type + data + CRC32(type ++ data). */
  private[llm] def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    require(t.length == 4, s"chunk type must be 4 bytes: $typ")
    val out = new Array[Byte](12 + data.length)
    out(0) = (data.length >>> 24).toByte; out(1) = (data.length >>> 16).toByte
    out(2) = (data.length >>> 8).toByte; out(3) = data.length.toByte
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32
    crc.update(out, 4, 4 + data.length)
    val c = crc.getValue
    out(8 + data.length) = (c >>> 24).toByte; out(9 + data.length) = (c >>> 16).toByte
    out(10 + data.length) = (c >>> 8).toByte; out(11 + data.length) = c.toByte
    out
  }

  /** tEXt payload: keyword NUL text (the spec's layout). */
  private def tEXt(keyword: String, text: String): Array[Byte] =
    chunk("tEXt", (keyword + "\u0000" + text).getBytes("ISO-8859-1"))

  /** The deterministic metadata decoration: every doc an Author tEXt
    * (`user-<doc_id>` — size varies with the id's digits), even docs a
    * fixed GPS tEXt, every third doc a 7-byte tIME. Chunk byte cost is
    * 12 + data length; the oracle restates these sizes in SQL. */
  private[llm] def metaChunks(docId: Long): Seq[Array[Byte]] =
    Seq(tEXt("Author", s"user-$docId")) ++
      (if (docId % 2 == 0) Seq(tEXt("GPS", "47.60,-122.33")) else Nil) ++
      (if (docId % 3 == 0) Seq(chunk("tIME", Array[Byte](7, (0xE2 - 256).toByte, 8, 16, 3, 4, 5))) else Nil)

  /** Injected-type allowlist the gate counts (ImageIO never emits
    * these spontaneously, so the count is closed-form). */
  private val InjectedTypes = Set("tEXt", "tIME")

  /** Walk a PNG's chunks; None if the bytes are not a walkable PNG.
    * Returns (offset, totalLen, type) per chunk. A chunk whose declared
    * length runs past the buffer (truncation, or a lying length) ends
    * the walk as a failure — a torn container is poison, not data. */
  private[llm] def walk(png: Array[Byte]): Option[Seq[(Int, Int, String)]] = {
    if (png.length < 8 || !java.util.Arrays.equals(png.slice(0, 8), Sig)) return None
    val out = Seq.newBuilder[(Int, Int, String)]
    var off = 8
    var sawEnd = false
    while (off < png.length && !sawEnd) {
      if (off + 8 > png.length) return None
      val len = be(png, off)
      if (len < 0 || off + 12L + len > png.length) return None
      val typ = new String(png, off + 4, 4, "US-ASCII")
      out += ((off, 12 + len, typ))
      if (typ == "IEND") sawEnd = true
      off += 12 + len
    }
    if (sawEnd) Some(out.result()) else None
  }

  /** Insert metadata chunks immediately after IHDR (a legal position
    * for every ancillary type used here). */
  private[llm] def inject(png: Array[Byte], metas: Seq[Array[Byte]]): Option[Array[Byte]] =
    walk(png).map { chunks =>
      val (ihdrOff, ihdrLen, _) = chunks.find(_._3 == "IHDR").getOrElse(chunks.head)
      val cut = ihdrOff + ihdrLen
      val metaLen = metas.map(_.length).sum
      val out = new Array[Byte](png.length + metaLen)
      System.arraycopy(png, 0, out, 0, cut)
      var o = cut
      metas.foreach { m => System.arraycopy(m, 0, out, o, m.length); o += m.length }
      System.arraycopy(png, cut, out, o, png.length - cut)
      out
    }

  /** Drop every ancillary chunk (lowercase first type letter); critical
    * chunks copy verbatim. Returns the stripped PNG plus the dropped
    * (type, totalBytes) list. */
  private[llm] def strip(png: Array[Byte]): Option[(Array[Byte], Seq[(String, Int)])] =
    walk(png).map { chunks =>
      val (keep, drop) = chunks.partition { case (_, _, typ) => (typ.charAt(0) & 0x20) == 0 }
      val out = new Array[Byte](8 + keep.map(_._2).sum)
      System.arraycopy(png, 0, out, 0, 8)
      var o = 8
      keep.foreach { case (off, len, _) =>
        System.arraycopy(png, off, out, o, len); o += len
      }
      (out, drop.map { case (_, len, typ) => (typ, len) })
    }

  /** Fixture → inject → strip → verify, all partition-local. */
  def stripStats(documents: DataFrame): Dataset[StripStats] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      ImageIO.setUseCache(false) // in-memory streams (ImagePhash posture)
      ids.flatMap { id =>
        val base = ImagePhash.encodeImage(id, 0)
        for {
          injected <- inject(base, metaChunks(id))
          (stripped, dropped) <- strip(injected)
          (again, droppedAgain) <- strip(stripped)
        } yield {
          val meta = dropped.filter(d => InjectedTypes(d._1))
          val img = ImageIO.read(new ByteArrayInputStream(stripped))
          val pixelsOk = img != null && {
            val r = img.getRaster
            (0 until ImagePhash.Side).forall(y => (0 until ImagePhash.Side).forall(x =>
              r.getSample(x, y, 0) == ImagePhash.pixel(id, 0, x, y)))
          }
          StripStats(id, meta.size, meta.map(_._2.toLong).sum,
            droppedAgain.isEmpty && java.util.Arrays.equals(again, stripped),
            pixelsOk)
        }
      }
    }
  }

  /** m9 gate frame. */
  def gate(documents: DataFrame): DataFrame =
    stripStats(documents).toDF()
      .select(col("doc_id"), col("n_meta_chunks"), col("meta_bytes"),
        col("strip_idempotent"), col("pixels_ok"))
      .orderBy("doc_id")

  /** Closed-form oracle: chunk sizes are 12 + data bytes — Author tEXt
    * data is 7 + 5 + digits(doc_id), GPS tEXt data is 4 + 13, tIME data
    * is 7. The booleans are the structural invariants the real walk
    * must land. */
  val oracleSql: String =
    """SELECT doc_id,
        CAST(1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
           + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_meta_chunks,
        CAST((12 + 7 + 5 + len(CAST(doc_id AS VARCHAR)))
           + CASE WHEN doc_id % 2 = 0 THEN 12 + 4 + 13 ELSE 0 END
           + CASE WHEN doc_id % 3 = 0 THEN 12 + 7 ELSE 0 END AS BIGINT) AS meta_bytes,
        true AS strip_idempotent,
        true AS pixels_ok
      FROM documents ORDER BY doc_id"""
}

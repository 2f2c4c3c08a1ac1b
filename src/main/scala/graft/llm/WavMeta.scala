package graft.llm

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Metadata scrubbing for AUDIO containers — the third member of the
  * binary-redaction family (m9 PNG chunks, m10 JPEG APPn/COM markers):
  * WAV files carry artist / creation-date / comment PII in a RIFF
  * `LIST` chunk of form type `INFO` (IART/ICRD/ICMT sub-chunks, the
  * public RIFF 1991 spec layout), and a corpus pipeline strips it
  * before the bytes are persisted. The strip walks the top-level RIFF
  * chunk stream once, drops every LIST/INFO chunk, copies `fmt ` and
  * `data` verbatim (samples are never re-encoded), and rewrites the
  * RIFF size field — so scrubbing an injected container restores the
  * original bytes EXACTLY, the strongest possible content-preservation
  * invariant (`restores_original` rides in the gate).
  *
  * The walk is REAL byte parsing over real containers
  * ([[AudioFingerprint]]'s hand-framed 16-bit PCM WAVs with a
  * spec-correct LIST/INFO injected between `fmt ` and `data`) — the
  * full encode→inject→bytes→walk→strip→decode path. Poison posture
  * (the m-series clamp): a payload that is not a walkable WAV — wrong
  * signature, truncated chunk, sub-even-size lying length — costs one
  * dropped row, never a throw (WavMetaSpec feeds each class).
  *
  * Oracle-exactness is the m5/m9 closed-form posture: the injected
  * INFO layout is a deterministic function of doc_id (sub-chunk data
  * sizes restated as SQL arithmetic, including RIFF's pad-to-even
  * rule), so DuckDB recomputes expected tag counts and byte savings
  * while Spark's numbers travelled through real container bytes.
  *
  * 100 TB shape: inject/strip/verify run `mapPartitions`-local —
  * payload bytes never shuffle; only doc_id-keyed counters leave the
  * executor.
  */
object WavMeta {

  final case class WavStripStats(doc_id: Long, n_info_tags: Int,
      meta_bytes: Long, strip_idempotent: Boolean, restores_original: Boolean)

  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def rle32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
  private def rtag(p: Array[Byte], off: Int): String =
    new String(p, off, 4, "US-ASCII")

  /** One INFO sub-chunk: FOURCC + LE size + NUL-terminated data, padded
    * to even length per the RIFF rule (the pad byte is OUTSIDE the
    * declared size). */
  private[llm] def infoTag(fourcc: String, value: String): Array[Byte] = {
    val data = (value + "\u0000").getBytes("US-ASCII")
    val out = new ByteArrayOutputStream(8 + data.length + 1)
    out.write(fourcc.getBytes("US-ASCII")); le32(out, data.length)
    out.write(data)
    if ((data.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** The deterministic decoration: every doc an IART artist tag
    * (`user-<doc_id>` — size varies with the id's digits), even docs an
    * ICRD date, every third doc an ICMT comment. */
  private[llm] def metaTags(docId: Long): Seq[Array[Byte]] =
    Seq(infoTag("IART", s"user-$docId")) ++
      (if (docId % 2 == 0) Seq(infoTag("ICRD", "2026-08-16")) else Nil) ++
      (if (docId % 3 == 0) Seq(infoTag("ICMT", "graft synthetic clip")) else Nil)

  /** Frame the tags as one `LIST` chunk of form type `INFO`. */
  private[llm] def listInfoChunk(tags: Seq[Array[Byte]]): Array[Byte] = {
    val body = tags.map(_.length).sum
    val out = new ByteArrayOutputStream(12 + body)
    out.write("LIST".getBytes("US-ASCII")); le32(out, 4 + body)
    out.write("INFO".getBytes("US-ASCII"))
    tags.foreach(out.write)
    out.toByteArray
  }

  /** Walk a WAV's top-level chunks; None if not a walkable RIFF/WAVE.
    * Returns (offset, totalLenWithPad, type) per chunk. A declared size
    * running past the buffer ends the walk as poison. */
  private[llm] def walk(wav: Array[Byte]): Option[Seq[(Int, Int, String)]] = {
    if (wav.length < 12 || rtag(wav, 0) != "RIFF" || rtag(wav, 8) != "WAVE")
      return None
    val out = Seq.newBuilder[(Int, Int, String)]
    var off = 12
    while (off < wav.length) {
      if (off + 8 > wav.length) return None
      val sz = rle32(wav, off + 4)
      val tot = 8 + sz + (sz & 1)
      if (sz < 0 || off + tot > wav.length) return None
      out += ((off, tot.toInt, rtag(wav, off)))
      off += tot.toInt
    }
    Some(out.result())
  }

  /** Insert a LIST/INFO chunk immediately after `fmt ` (the customary
    * position), fixing the RIFF size field. */
  private[llm] def inject(wav: Array[Byte], list: Array[Byte]): Option[Array[Byte]] =
    walk(wav).map { chunks =>
      val (fmtOff, fmtLen, _) = chunks.find(_._3 == "fmt ").getOrElse(chunks.head)
      val cut = fmtOff + fmtLen
      val out = new ByteArrayOutputStream(wav.length + list.length)
      out.write(wav, 0, 4)
      le32(out, (rle32(wav, 4) + list.length).toInt)
      out.write(wav, 8, cut - 8)
      out.write(list)
      out.write(wav, cut, wav.length - cut)
      out.toByteArray
    }

  /** Drop every LIST chunk whose form type is INFO; all other chunks
    * copy verbatim; RIFF size is rewritten. Returns the stripped WAV
    * plus the dropped byte total and INFO tag count. */
  private[llm] def strip(wav: Array[Byte]): Option[(Array[Byte], Long, Int)] =
    walk(wav).map { chunks =>
      val isInfoList = (c: (Int, Int, String)) =>
        c._3 == "LIST" && c._2 >= 12 && rtag(wav, c._1 + 8) == "INFO"
      val (drop, keep) = chunks.partition(isInfoList)
      val kept = keep.map(_._2).sum
      val out = new ByteArrayOutputStream(12 + kept)
      out.write(wav, 0, 4)
      le32(out, 4 + kept)
      out.write(wav, 8, 4)
      keep.foreach { case (off, len, _) => out.write(wav, off, len) }
      val tags = drop.map { case (off, len, _) =>
        // count sub-chunks inside the LIST body (starts after "INFO")
        var o = off + 12
        var n = 0
        val end = off + len
        while (o + 8 <= end) {
          val sz = rle32(wav, o + 4)
          n += 1
          o += (8 + sz + (sz & 1)).toInt
        }
        n
      }.sum
      (out.toByteArray, drop.map(_._2.toLong).sum, tags)
    }

  /** Fixture → inject → strip → verify, all partition-local. */
  def stripStats(documents: DataFrame): Dataset[WavStripStats] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      ids.flatMap { id =>
        val base = AudioFingerprint.encodeWav(id, 0)
        for {
          injected <- inject(base, listInfoChunk(metaTags(id)))
          (stripped, metaBytes, nTags) <- strip(injected)
          (again, againBytes, _) <- strip(stripped)
        } yield WavStripStats(id, nTags, metaBytes,
          againBytes == 0L && java.util.Arrays.equals(again, stripped),
          java.util.Arrays.equals(stripped, base))
      }
    }
  }

  /** m11 gate frame. */
  def gate(documents: DataFrame): DataFrame =
    stripStats(documents).toDF()
      .select(col("doc_id"), col("n_info_tags"), col("meta_bytes"),
        col("strip_idempotent"), col("restores_original"))
      .orderBy("doc_id")

  /** Closed-form oracle: an INFO tag costs 8 + its NUL-terminated data
    * padded to even; IART data is 5 + digits(doc_id) + 1, ICRD data is
    * 11 → padded 12, ICMT data is 21 → padded 22; the LIST wrapper adds
    * 8 + 4. The booleans are the structural invariants the real walk
    * must land. */
  val oracleSql: String =
    """SELECT doc_id,
        CAST(1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
           + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_info_tags,
        CAST(12
           + 8 + (6 + len(CAST(doc_id AS VARCHAR)))
               + (6 + len(CAST(doc_id AS VARCHAR))) % 2
           + CASE WHEN doc_id % 2 = 0 THEN 8 + 12 ELSE 0 END
           + CASE WHEN doc_id % 3 = 0 THEN 8 + 22 ELSE 0 END AS BIGINT) AS meta_bytes,
        true AS strip_idempotent,
        true AS restores_original
      FROM documents ORDER BY doc_id"""
}

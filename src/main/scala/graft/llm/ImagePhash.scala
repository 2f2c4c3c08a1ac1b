package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual (pixel-level) image near-duplicate detection — the pass
  * byte-digest dedup (m2/m3) structurally cannot do: a re-encoded
  * duplicate (same pixels, different container/compressor) has a
  * different byte digest but the SAME pixel content, and every
  * production multimodal pipeline runs a pHash-family dedup for exactly
  * that reason.
  *
  * The hash is an integer-exact 64-bit AVERAGE HASH (aHash — the
  * classic block-mean fingerprint, the simplest member of the
  * pHash/dHash family): decode the image, partition the 32×32
  * grayscale grid into 8×8 blocks of 4×4 pixels, bit b = 1 iff the
  * block's pixel SUM times 64 exceeds the image's total pixel sum
  * (i.e. block mean > global mean, kept in pure integer arithmetic so
  * the hash is bit-identical across engines/platforms — no float mean,
  * no rounding mode). Near-dup pairing is Hamming-band LSH, the d5/d6
  * SimHash posture: the 64 bits split into 8 one-byte bands; any pair
  * within Hamming distance ≤ 7 shares at least one identical band
  * (pigeonhole), so a band equi-join is a COMPLETE candidate generator
  * for the ≤ 7 threshold — never a cartesian pair scan.
  *
  * Decode is REAL: payloads are PNG/BMP containers produced by
  * `javax.imageio` (on the vanilla JVM classpath) and the hash side
  * reads back pixels from the BYTES with `ImageIO.read` — the full
  * encode→bytes→decode→hash path a production pipeline runs, not a
  * formula shortcut. Cross-engine oracle-exactness comes from the
  * FIXTURE being closed-form: test images are deterministic grayscale
  * gradients g(doc_id, x, y) (below), and PNG/BMP are lossless, so a
  * DuckDB oracle can recompute the identical hash from the pixel
  * formula in SQL while Spark's number travelled through real codec
  * bytes. Re-encoded duplicates are planted by construction: every doc
  * gets a PNG (enc 0), even docs ALSO get the same pixels as BMP
  * (enc 1 — different bytes, byte-dedup-invisible, Hamming 0 here),
  * and every third doc gets a one-pixel-perturbed PNG (enc 2 — a
  * near-dup at small positive Hamming distance).
  *
  * Poison posture (the m-series clamp): a payload that fails to decode
  * — truncated container, not an image, wrong dimensions — costs
  * exactly one dropped row, never the partition and never a throw
  * (ImagePhashSpec feeds garbage payloads).
  *
  * 100 TB shape: hashing is partition-local `mapPartitions` (one codec
  * per partition, payload bytes never shuffle); pairing shuffles only
  * (band, byte) keys + one packed long per side; candidate
  * verification is bit_count(xor) — plain long arithmetic in
  * whole-stage codegen. The collision volume itself is
  * bucket-occupancy-bound (Σ per-(band,byte) n² — d6's documented
  * shape): one-byte bands saturate past ~10⁵ assets, and the scale
  * path is a wider hash (256-bit DCT pHash → 2-byte bands at the same
  * completeness radius), not a different join. Reference for the
  * operator family: tee8z/noaa-data-pipeline has nothing multimodal —
  * this extends the engine the way SURVEY §2's LLM additions do.
  */
object ImagePhash {

  /** One encoded image: `asset_id = doc_id*4 + enc`. */
  final case class ImageAsset(asset_id: Long, doc_id: Long, enc: Int,
      payload: Array[Byte])

  /** 64-bit aHash packed into one long (bit b = block b; band i =
    * bits 8i..8i+7). One long keeps the whole pairing pipeline in
    * whole-stage codegen — xor / bit_count / shift-mask — where an
    * 8-element array form pays interpreted higher-order functions per
    * candidate row (measured 10x-replica pairing: array HOFs over the
    * ~140M-row collision volume dominated the query; longs do not). */
  final case class ImageHash(asset_id: Long, doc_id: Long, enc: Int,
      hash: Long)

  val Side = 32        // image is Side×Side grayscale
  val Block = 4        // 4×4-pixel blocks → 8×8 = 64 bits
  val Grid: Int = Side / Block

  /** The deterministic fixture pixel: a doc_id-keyed integer gradient,
    * with enc 2 perturbing exactly one doc_id-chosen pixel by +64
    * (mod 256). Pure long arithmetic — the DuckDB oracle states the
    * same expression in SQL. The doc enters through the gradient
    * DIRECTIONS (x/y coefficients and a quadratic xy term), not just an
    * additive offset: aHash thresholds block mean vs global mean, so a
    * uniform brightness shift leaves the hash invariant (measured — an
    * additive-only doc term made 500 docs collapse to ~the same hash
    * and 49k spurious pairs); with per-doc directions the sf0.1 output
    * is exactly the planted same-doc dups, zero cross-doc noise. */
  def pixel(docId: Long, enc: Int, x: Int, y: Int): Int = {
    val base = (x * ((docId * 2654435761L) % 256) + y * ((docId * 40503L) % 256) +
      x * y * (1 + docId % 13) + docId % 251) % 256
    val bump =
      if (enc == 2 && x == (docId % 32).toInt && y == ((docId / 32) % 32).toInt) 64
      else 0
    ((base + bump) % 256).toInt
  }

  private[llm] def encodeImage(docId: Long, enc: Int): Array[Byte] = {
    val img = new BufferedImage(Side, Side, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < Side) {
      var x = 0
      while (x < Side) { raster.setSample(x, y, 0, pixel(docId, enc, x, y)); x += 1 }
      y += 1
    }
    val fmt = if (enc == 1) "bmp" else "png"
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  /** Synthesize the fixture assets from `documents`: PNG for every doc,
    * a byte-distinct lossless re-encode (BMP) for even docs, a
    * one-pixel near-dup PNG for docs divisible by 3. Encode runs
    * executor-side per partition — the driver never sees payload
    * bytes. */
  def synthAssets(documents: DataFrame): Dataset[ImageAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      // ImageIO's default stream cache is a TEMP FILE per encode —
      // disk I/O per image; in-memory streams are the per-partition
      // codec posture (measured at the 10x replica: the file-backed
      // cache dominated the whole query)
      ImageIO.setUseCache(false)
      ids.flatMap { id =>
        val encs = Seq(0) ++ (if (id % 2 == 0) Seq(1) else Nil) ++
          (if (id % 3 == 0) Seq(2) else Nil)
        encs.iterator.map(e => ImageAsset(id * 4 + e, id, e, encodeImage(id, e)))
      }
    }
  }

  /** [[synthAssets]] for explicit (doc_id, enc) rows — the streaming
    * screen's fixture shape, where a doc's encodings land in DIFFERENT
    * micro-batches (forcing re-encode pairs through the
    * cross-generation path instead of the within-batch one). */
  def synthAssetRows(rows: org.apache.spark.sql.DataFrame): Dataset[ImageAsset] = {
    import rows.sparkSession.implicits._
    rows.select(col("doc_id").cast("long"), col("enc").cast("int"))
      .as[(Long, Int)].mapPartitions { it =>
        ImageIO.setUseCache(false) // in-memory streams (see synthAssets)
        it.map { case (id, e) => ImageAsset(id * 4 + e, id, e, encodeImage(id, e)) }
      }
  }

  /** Decode payload bytes and compute the integer-exact aHash. Returns
    * None for anything that is not a decodable Side×Side image — the
    * poison clamp. Reads the first raster band: TYPE_BYTE_GRAY decodes
    * with one band; if a codec round-trips through RGB, the fixture's
    * R=G=B makes band 0 still the gray value. */
  private[llm] def hashPayload(asset: ImageAsset): Option[ImageHash] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(asset.payload))
      if (img == null || img.getWidth != Side || img.getHeight != Side) None
      else {
        val raster = img.getRaster
        val blockSum = new Array[Long](Grid * Grid)
        var total = 0L
        var y = 0
        while (y < Side) {
          var x = 0
          while (x < Side) {
            val g = raster.getSample(x, y, 0).toLong
            blockSum((y / Block) * Grid + (x / Block)) += g
            total += g
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (blockSum(b) * 64 > total) hash |= 1L << b
          b += 1
        }
        Some(ImageHash(asset.asset_id, asset.doc_id, asset.enc, hash))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batch hash: one codec context per partition, bad rows dropped. */
  def avgHash(assets: Dataset[ImageAsset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      ImageIO.setUseCache(false) // in-memory streams (see synthAssets)
      rows.flatMap(hashPayload)
    }
  }

  /** Hamming-band LSH near-dup pairs over hashed assets — the shared
    * [[HammingLsh]] candidate generator (band equi-join, complete for
    * maxHamming <= 7 by pigeonhole, first-matching-band dedup in
    * codegen): one row per unordered pair (asset_a < asset_b) with its
    * exact bit_count(xor) distance. */
  def nearDupPairs(hashes: Dataset[ImageHash], maxHamming: Int = 7): DataFrame =
    HammingLsh.nearDupPairs(hashes.toDF, maxHamming)
}

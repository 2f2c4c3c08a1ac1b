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
  * (band, byte) keys + 8-byte hashes; candidate verification is an
  * `aggregate(zip_with(...))` over two 8-element arrays. Reference for
  * the operator family: tee8z/noaa-data-pipeline has nothing
  * multimodal — this extends the engine the way SURVEY §2's LLM
  * additions do.
  */
object ImagePhash {

  /** One encoded image: `asset_id = doc_id*4 + enc`. */
  final case class ImageAsset(asset_id: Long, doc_id: Long, enc: Int,
      payload: Array[Byte])

  /** 64-bit aHash as 8 one-byte bands (band i holds bits 8i..8i+7);
    * byte-valued ints sidestep 64-bit sign headaches in BOTH engines. */
  final case class ImageHash(asset_id: Long, doc_id: Long, enc: Int,
      bands: Array[Int])

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

  private def encodeImage(docId: Long, enc: Int): Array[Byte] = {
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
      ids.flatMap { id =>
        val encs = Seq(0) ++ (if (id % 2 == 0) Seq(1) else Nil) ++
          (if (id % 3 == 0) Seq(2) else Nil)
        encs.iterator.map(e => ImageAsset(id * 4 + e, id, e, encodeImage(id, e)))
      }
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
        val bands = new Array[Int](8)
        var b = 0
        while (b < 64) {
          if (blockSum(b) * 64 > total) bands(b / 8) |= 1 << (b % 8)
          b += 1
        }
        Some(ImageHash(asset.asset_id, asset.doc_id, asset.enc, bands))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batch hash: one codec context per partition, bad rows dropped. */
  def avgHash(assets: Dataset[ImageAsset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap(hashPayload))
  }

  /** Hamming-band LSH near-dup pairs over hashed assets: explode the 8
    * bands, equi-join on (band, byte) — complete for maxHamming ≤ 7 —
    * then verify the exact distance on the full 8-byte vectors with
    * zip_with/aggregate (codegen'd array ops, no UDF). Output one row
    * per unordered pair (asset_a < asset_b) with its distance. */
  def nearDupPairs(hashes: Dataset[ImageHash], maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7,
      "8 one-byte bands are only a complete candidate generator up to Hamming 7")
    val h = hashes.toDF.select(col("asset_id"), col("bands"))
    val bands = h.select(col("asset_id"),
      posexplode(col("bands")).as(Seq("band", "byte")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.byte") === col("b.byte") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("asset_a"), col("b.asset_id").as("asset_b"))
      .distinct()
    cand
      .join(h.select(col("asset_id").as("asset_a"), col("bands").as("ba")), "asset_a")
      .join(h.select(col("asset_id").as("asset_b"), col("bands").as("bb")), "asset_b")
      .withColumn("hamming",
        expr("aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
      .where(col("hamming") <= maxHamming)
      .select(col("asset_a"), col("asset_b"), col("hamming").cast("int").as("hamming"))
  }
}

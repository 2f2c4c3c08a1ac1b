package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}

/** The media corpus-prep FRONT HALF as one partition-local pass —
  * scrub metadata, then fingerprint the scrubbed bytes — feeding the
  * keep-list composition (p4_media_prep): what p1 is for documents and
  * p3 for crawled text, this is for a binary media column. Order
  * matters and is the production order: PII must leave the bytes
  * BEFORE anything derived from them is persisted, and the perceptual
  * hash must be computed over the bytes the corpus will actually ship.
  * The strip preserves pixels bit-exactly (PngMeta/JpegMeta copy
  * critical chunks / the scan verbatim), so scrubbing cannot move any
  * asset across a Hamming threshold — the pair graph over scrubbed
  * bytes equals m4's over originals, which is what lets the oracle
  * replay the hash closed-form.
  *
  * Container dispatch is by SIGNATURE, not by trusted type metadata
  * (the crawl posture — upstream lies): PNG → [[PngMeta.strip]],
  * JPEG → [[JpegMeta.strip]], anything else passes through untouched
  * with zero savings (the m4 roster's BMP takes this path — BMP has no
  * metadata container to strip; a real JPEG exercises the JPEG branch
  * in MediaPrepSpec, kept out of the PAIRING roster because a lossy
  * re-encode moves pixels and the oracle's closed-form hash with
  * them). A payload that fails its container walk costs one dropped
  * row (the m-series poison clamp).
  *
  * 100 TB shape: synth → inject → strip → decode → hash is one
  * mapPartitions over the binary column; payload bytes never shuffle —
  * the emitted frame is (ids, 8-byte hash, savings counter).
  */
object MediaPrep {

  final case class PrepRow(asset_id: Long, doc_id: Long, enc: Int,
      hash: Long, meta_removed: Long)

  private val PngInjected = Set("tEXt", "tIME")
  private val JpegInjected = Set(0xE1, 0xED, 0xFE)

  /** Scrub one payload: (clean bytes, injected-metadata bytes removed);
    * None = poison (a container whose walk fails). */
  private[llm] def scrub(assetId: Long, payload: Array[Byte]): Option[(Array[Byte], Long)] =
    if (payload.length >= 2 && (payload(0) & 0xFF) == 0x89 && payload(1) == 'P')
      for {
        injected <- PngMeta.inject(payload, PngMeta.metaChunks(assetId))
        (clean, dropped) <- PngMeta.strip(injected)
      } yield (clean, dropped.filter(d => PngInjected(d._1)).map(_._2.toLong).sum)
    else if (payload.length >= 2 && (payload(0) & 0xFF) == 0xFF && (payload(1) & 0xFF) == 0xD8)
      for {
        injected <- JpegMeta.inject(payload, JpegMeta.metaSegments(assetId))
        (clean, dropped) <- JpegMeta.strip(injected)
      } yield (clean, dropped.filter(d => JpegInjected(d._1)).map(_._2.toLong).sum)
    else Some((payload, 0L))

  /** m4's asset roster → inject (PNG) → strip → decode + aHash, one
    * partition-local pass. */
  def prep(documents: DataFrame): Dataset[PrepRow] = {
    import documents.sparkSession.implicits._
    ImagePhash.synthAssets(documents).mapPartitions { assets =>
      javax.imageio.ImageIO.setUseCache(false)
      assets.flatMap { a =>
        for {
          (clean, removed) <- scrub(a.asset_id, a.payload)
          h <- ImagePhash.hashPayload(
            ImagePhash.ImageAsset(a.asset_id, a.doc_id, a.enc, clean))
        } yield PrepRow(a.asset_id, a.doc_id, a.enc, h.hash, removed)
      }
    }
  }
}

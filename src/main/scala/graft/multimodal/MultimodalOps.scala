package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Raw multimodal asset: opaque bytes plus a MIME-ish kind tag. At
  * 100 TB, image/audio/video payloads live exactly like this — a
  * `binary` column next to typed metadata, scanned from parquet — and
  * every transform below operates on that representation.
  */
case class RawAsset(asset_id: Long, kind: String, bytes: Array[Byte])

/** Typed decode output (the "image header" a real codec would emit). */
case class AssetFeatures(asset_id: Long, n_bytes: Int, width: Int,
                         height: Int, channels: Int, feature_hash: Long)

/** One sampled "frame" of a (fake-)video asset. */
case class FrameSample(asset_id: Long, frame_idx: Int, byte_offset: Int,
                       frame_hash: Long)

/** Multimodal-column operators: binary assets in, typed features out.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB — dimensions and hashes derive from the asset's
  * md5 (arithmetic a SQL oracle reproduces, keeping even the stub
  * correctness-checked). Everything around the stub is the real
  * production shape and is what these operators actually exercise:
  *
  *  - assets flow as `binary` columns with typed metadata, not paths;
  *  - per-partition batch processing via `mapPartitions` with one
  *    decoder instance (here a MessageDigest, in production a codec
  *    context) amortized across the partition's rows — the same batch
  *    shape a Pandas-UDF/`mapInPandas` pipeline has in PySpark;
  *  - narrow transforms: no shuffle is introduced by decoding, so at
  *    scale the work rides the scan partitions (swap [[stubDecode]]
  *    for a real codec and nothing about the plan changes);
  *  - frame sampling fans out rows via a typed `flatMap`-style
  *    iterator inside the same partition pass.
  */
object MultimodalOps {

  val FrameHashPrime = 2147483647L

  /** Deterministic stand-in for a codec: md5-derived pseudo-header.
    * Returns (h, width, height, channels) where h is the 28-bit md5
    * prefix — the same `CAST('0x' || substr(md5(x),1,7) AS BIGINT)`
    * integer DuckDB computes.
    */
  def stubDecode(bytes: Array[Byte], md: MessageDigest): (Long, Int, Int, Int) = {
    val h = graft.functions.TextFunctions.h7Jvm(bytes, md)
    val width = 16 + (h % 1024).toInt
    val height = 16 + ((h / 1024) % 1024).toInt
    val channels = 1 + ((h / 1048576) % 4).toInt
    (h, width, height, channels)
  }

  /** Lift a text table into the asset representation: UTF-8 bytes as
    * the payload. (Real corpora would read image/audio bytes from
    * parquet directly; the testdata has no binary media, so text
    * plays that role byte-for-byte.)
    */
  def documentsAsAssets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("asset_id"), lit("text/utf-8").as("kind"),
      col("text").cast("binary").as("bytes"))

  /** Decode features per asset — one decoder per PARTITION, streamed
    * over the partition's rows (never one per row, never a
    * collect-to-driver loop).
    */
  def decodeFeatures(assets: Dataset[RawAsset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { a =>
        val (h, w, ht, c) = stubDecode(a.bytes, md)
        AssetFeatures(a.asset_id, a.bytes.length, w, ht, c, h)
      }
    }
  }

  /** Sample pseudo-frames: 1 + (h % 8) frames per asset, evenly spaced
    * byte offsets, per-frame rolling hash. The row fan-out happens
    * inside the partition iterator — the plan stays a narrow
    * mapPartitions over the scan.
    */
  def sampleFrames(assets: Dataset[RawAsset]): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { a =>
        val (h, _, _, _) = stubDecode(a.bytes, md)
        val nFrames = 1 + (h % 8).toInt
        val stride = a.bytes.length / nFrames
        (0 until nFrames).iterator.map { i =>
          FrameSample(a.asset_id, i, i * stride, (h * 31 + i) % FrameHashPrime)
        }
      }
    }
  }

}

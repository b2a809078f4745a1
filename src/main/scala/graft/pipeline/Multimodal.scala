package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video carried as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The Spark side is real and tested: schema, partitioning, the
  * mapPartitions batch shape (decode amortized per partition, not per row),
  * and the feature-column contract. The actual media decode is a STUB —
  * this container has no image/audio codecs — replaced by a deterministic
  * fake ([[StubCodec]]) so tests are exact; swapping in a real decoder
  * changes only the function body, not the pipeline.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the schema a real
    * multimodal corpus table would have). */
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
      declared_w: Int, declared_h: Int)

  /** Extracted features: fixed-width embedding + decoded dims. */
  final case class MediaFeatures(doc_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, features: Array[Float])

  /** DETERMINISTIC FAKE of a media codec. A real implementation would call
    * an image/audio library here; everything around it stays unchanged. */
  object StubCodec {
    val FeatureDim = 8

    /** "Decode" dims from the payload: stable function of the bytes. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val n = bytes.length
      (16 + (n % 64), 16 + ((n / 64) % 64))
    }

    /** "Feature-extract": 8 rolling byte-hash lanes, normalized. Stands in
      * for an encoder forward pass; deterministic in the payload. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        val lane = i % FeatureDim
        acc(lane) = (acc(lane) * 31 + (bytes(i) & 0xff)) % 1048576L
        i += 1
      }
      acc.map(v => v.toFloat / 1048576.0f)
    }

    /** "Frame-sample" a video payload: every strideth 256-byte chunk. */
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
      bytes.grouped(256).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => chunk
      }.toSeq
  }

  /** Attach a synthetic media payload to a text corpus (deterministic in the
    * text — the sandbox stand-in for reading a real media column). */
  def attachMedia(df: DataFrame, id: String = "doc_id",
      text: String = "text"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long").as("doc_id"), col(text).as("t"))
      .as[(Long, String)]
      .map { case (docId, t) =>
        val bytes = t.getBytes("UTF-8")
        val kind = (docId % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val (w, h) = StubCodec.decodeDims(bytes)
        MediaRow(docId, kind, bytes, w, h)
      }
  }

  /** Batched decode + feature extraction: one mapPartitions pass (the shape
    * a real codec needs — per-partition init cost amortized across rows,
    * bounded batch memory; mirrors `mapInPandas` batching semantics). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // a real decoder would initialize its codec context HERE, once
      rows.map { r =>
        val (w, h) = StubCodec.decodeDims(r.media)
        MediaFeatures(r.doc_id, r.kind, w, h, r.media.length.toLong,
          StubCodec.features(r.media))
      }
    }
  }

  /** Video frame sampling as a table op: (doc_id, frame_no, frame_bytes). */
  def sampleVideoFrames(media: Dataset[MediaRow], stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      StubCodec.sampleFrames(r.media, stride).zipWithIndex.map {
        case (f, i) => (r.doc_id, i, f)
      }
    }.toDF("doc_id", "frame_no", "frame_bytes")
  }

  /** Full stub pipeline over a text corpus: features table with embedding
    * column ready for [[Similarity]] ops. */
  def featuresTable(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(attachMedia(docs)).toDF()
}

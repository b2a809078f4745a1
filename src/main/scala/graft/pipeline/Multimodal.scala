package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable media codec: the ONE seam between the (real, tested) Spark
  * plumbing and an actual decoder library. Implementations must be
  * serializable — the codec object ships to executors; per-partition native
  * context (library handles, GPU sessions) belongs in [[MediaCodec.Session]],
  * opened once per partition and closed when the partition drains.
  */
trait MediaCodec extends Serializable {
  /** Width of the feature/embedding vectors this codec emits. */
  def featureDim: Int
  /** Open a per-partition decode context (called once per partition). */
  def open(): MediaCodec.Session
}

object MediaCodec {
  trait Session extends AutoCloseable {
    def decodeDims(kind: String, bytes: Array[Byte]): (Int, Int)
    def features(kind: String, bytes: Array[Byte]): Array[Float]
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]]
    override def close(): Unit = ()
  }
}

/** DETERMINISTIC FAKE codec — this container ships no image/audio/video
  * libraries, so the decode step is a stable function of the payload bytes.
  * It exists so the pipeline around it (schema, partitioning, batch shape,
  * per-partition session lifecycle) is exercised EXACTLY; a real codec
  * implements [[MediaCodec]] and plugs in without touching the pipeline. */
object StubCodec extends MediaCodec {
  val FeatureDim = 8
  override def featureDim: Int = FeatureDim

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

  override def open(): MediaCodec.Session = new MediaCodec.Session {
    def decodeDims(kind: String, bytes: Array[Byte]): (Int, Int) =
      StubCodec.decodeDims(bytes)
    def features(kind: String, bytes: Array[Byte]): Array[Float] =
      StubCodec.features(bytes)
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
      StubCodec.sampleFrames(bytes, stride)
  }
}

/** REAL image codec through the [[MediaCodec]] seam: `javax.imageio` PNG
  * decode (the one honest-to-goodness media decoder in this JRE — no
  * external image/audio libraries ship in the container). Proves the
  * per-partition session design against an actual decoder library:
  * `decodeDims` reads the PNG header via a full decode, `features` emits
  * per-channel means (the stand-in for an encoder forward pass — real,
  * derived from decoded PIXELS, not payload bytes), `sampleFrames`
  * treats a still as its own single frame. */
object ImageIoCodec extends MediaCodec {
  val FeatureDim = 3
  override def featureDim: Int = FeatureDim

  private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    // explicit memory-backed ImageInputStream: ImageIO.read(InputStream)
    // consults the global useCache flag (default true) and then spools
    // every payload through a FileCacheImageInputStream TEMP FILE — one
    // disk file create/write/delete per decoded row (guide §1.2 step 2:
    // per-task work; measured as the dominant q_mm_decode cost). The
    // payload is already fully in memory, so the disk spool buys nothing.
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    require(img != null, "undecodable image payload")
    img
  }

  override def open(): MediaCodec.Session = new MediaCodec.Session {
    // one-entry decode memo, keyed by payload REFERENCE: the pipeline
    // calls decodeDims then features on the same row's byte array, and
    // without this each row pays TWO full PNG decodes. Per-partition
    // session state, so no cross-thread sharing.
    private var lastBytes: Array[Byte] = null
    private var lastImg: java.awt.image.BufferedImage = null
    private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      if (bytes ne lastBytes) { lastImg = read(bytes); lastBytes = bytes }
      lastImg
    }
    def decodeDims(kind: String, bytes: Array[Byte]): (Int, Int) = {
      val img = decode(bytes)
      (img.getWidth, img.getHeight)
    }
    /** Per-channel (R, G, B) pixel means. Sums are exact longs; each mean
      * is one double division — on constant-fill images the mean IS the
      * fill value, exactly (the q_mm_decode oracle relies on this). */
    def features(kind: String, bytes: Array[Byte]): Array[Float] = {
      val img = decode(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array((sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
        (sb.toDouble / n).toFloat)
    }
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
      Seq(bytes)
  }
}

/** Multimodal-column plumbing: image/audio/video carried as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * per-partition passes through a pluggable [[MediaCodec]].
  *
  * The Spark side is real and tested: schema, partitioning, the
  * mapPartitions batch shape (codec session opened once per partition, not
  * per row — the `mapInPandas` batching semantics), and the feature-column
  * contract. The default codec is the deterministic [[StubCodec]] fake (no
  * media libraries ship in this container); tests also drive a custom
  * codec through the same pipeline.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the schema a real
    * multimodal corpus table would have). */
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
      declared_w: Int, declared_h: Int)

  /** Extracted features: fixed-width embedding + decoded dims. */
  final case class MediaFeatures(doc_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, features: Array[Float])

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

  /** Deterministic REAL-PNG corpus: one constant-fill W×H image per doc,
    * every parameter a closed form of the doc id —
    * W = 8 + id mod 16, H = 8 + (id div 16) mod 16,
    * (R, G, B) = (7·id, 13·id, 31·id) mod 256 — so a SQL oracle predicts
    * the DECODED stats without decoding anything, while the engine round
    * trips genuine PNG bytes through `ImageIO.write` → binary column →
    * [[ImageIoCodec]]. Encode runs map-side on executors (ids must be
    * non-negative, as the testdata's are — Java and SQL `%` differ on
    * negatives). */
  def attachPng(df: DataFrame, id: String = "doc_id"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long")).as[Long].map { docId =>
      val w = 8 + (docId % 16).toInt
      val h = 8 + ((docId / 16) % 16).toInt
      val rgb = (((docId * 7) % 256).toInt << 16) |
        (((docId * 13) % 256).toInt << 8) | ((docId * 31) % 256).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      // memory-backed ImageOutputStream for the same reason as
      // [[ImageIoCodec.read]]: the OutputStream overload of ImageIO.write
      // otherwise spools each encoded PNG through a disk-cache temp file
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      javax.imageio.ImageIO.write(img, "png", ios)
      ios.close()
      MediaRow(docId, "image", bos.toByteArray, w, h)
    }
  }

  /** One codec session per partition wrapped around a row iterator. The
    * session closes exactly once: on drain, AND via a task-completion
    * listener so early termination (limit/take, downstream exception) can't
    * leak a native session — drain-detection alone misses those paths and
    * can double-close (ADVICE r2). */
  private def withSession[T](codec: MediaCodec, rows: Iterator[MediaRow])(
      f: (MediaCodec.Session, MediaRow) => T): Iterator[T] = {
    val session = codec.open()
    var closed = false
    def closeOnce(): Unit = if (!closed) { closed = true; session.close() }
    // no TaskContext when driven as a plain local iterator (unit tests)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = rows.hasNext
        if (!h) closeOnce()
        h
      }
      def next(): T = f(session, rows.next())
    }
  }

  /** Batched decode + feature extraction: one mapPartitions pass (the shape
    * a real codec needs — per-partition init cost amortized across rows,
    * bounded batch memory). */
  def extractFeatures(media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      withSession(codec, rows) { (s, r) =>
        val (w, h) = s.decodeDims(r.kind, r.media)
        MediaFeatures(r.doc_id, r.kind, w, h, r.media.length.toLong,
          s.features(r.kind, r.media))
      }
    }
  }

  /** Video frame sampling as a table op: (doc_id, frame_no, frame_bytes). */
  def sampleVideoFrames(media: Dataset[MediaRow], stride: Int = 2,
      codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      withSession(codec, rows) { (s, r) =>
        s.sampleFrames(r.media, stride).zipWithIndex.map {
          case (f, i) => (r.doc_id, i, f)
        }
      }.flatten
    }.toDF("doc_id", "frame_no", "frame_bytes")
  }

  /** Full stub pipeline over a text corpus: features table with embedding
    * column ready for [[Similarity]] ops. */
  def featuresTable(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(attachMedia(docs)).toDF()
}

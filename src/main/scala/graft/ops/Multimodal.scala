package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct; feature extraction runs batched in
  * `mapPartitions` behind a pluggable decoder (one decoder init per task).
  *
  * The decode step is REAL for the formats the bare JDK can handle:
  * PNG/JPEG/BMP/GIF via `javax.imageio` (ships in java.desktop) and WAV/PCM
  * via a RIFF header parse — no external codec libraries needed. Video and
  * compressed audio (mp3/aac/opus) would need native libs that are not in
  * this container; rows of those kinds surface as all-zero feature vectors
  * with `decoded = 0` rather than failing the job, so a 100 TB pass over a
  * mixed corpus degrades per-row, not per-task.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("duration_ms", IntegerType, nullable = false)
  ))

  /** Decoder contract: bytes + metadata → fixed-dim feature vector.
    * Implementations MUST be deterministic per (bytes, kind) and MUST NOT
    * throw on malformed payloads (return the zero vector instead): one bad
    * row in a 100 TB corpus must not kill its whole task. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def features(bytes: Array[Byte], kind: String, width: Int, height: Int): Array[Float]
  }

  // --------------------------------------------------------------------------
  // Real decoders (pure JDK)
  // --------------------------------------------------------------------------

  /** Image feature layout (first `dim` entries, zero-padded):
    * [0]=decoded width, [1]=decoded height, [2]=channel count,
    * [3..5]=mean R/G/B in [0,1], [6]=mean luminance, [7]=luminance stddev,
    * [8]=min luminance, [9]=max luminance, [10]=1.0 (decoded ok flag).
    * Decode is `javax.imageio` — real PNG/JPEG/BMP/GIF parsing. */
  final class ImageIoDecoder(val dim: Int = 12) extends MediaDecoder {
    require(dim >= 11, s"ImageIoDecoder needs dim >= 11, got $dim")
    override def features(bytes: Array[Byte], kind: String, width: Int, height: Int): Array[Float] = {
      val out = new Array[Float](dim)
      try {
        // probe header dimensions BEFORE decoding: a decompression-bomb
        // stream (tiny bytes declaring huge width×height) would allocate
        // w·h·4 bytes inside ImageIO.read and the resulting
        // OutOfMemoryError is an Error that escapes the Exception catch —
        // killing the task, not the row. 16k×16k ≈ 1 GiB decoded is the cap.
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return out // unrecognized format → zero vector
        val reader = readers.next()
        val (pw, ph) =
          try {
            reader.setInput(iis)
            (reader.getWidth(0), reader.getHeight(0))
          } finally { reader.dispose(); iis.close() }
        if (pw <= 0 || ph <= 0 || pw > 16384 || ph > 16384) return out
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) return out // unrecognized format → zero vector
        val w = img.getWidth; val h = img.getHeight
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var sl = 0.0; var sl2 = 0.0
        var minL = Double.MaxValue; var maxL = Double.MinValue
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sr += r; sg += g; sb += b
            val lum = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            sl += lum; sl2 += lum * lum
            if (lum < minL) minL = lum
            if (lum > maxL) maxL = lum
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        out(0) = w.toFloat
        out(1) = h.toFloat
        out(2) = img.getColorModel.getNumColorComponents.toFloat
        out(3) = (sr / n / 255.0).toFloat
        out(4) = (sg / n / 255.0).toFloat
        out(5) = (sb / n / 255.0).toFloat
        out(6) = (sl / n).toFloat
        out(7) = math.sqrt(math.max(0.0, sl2 / n - (sl / n) * (sl / n))).toFloat
        out(8) = minL.toFloat
        out(9) = maxL.toFloat
        out(10) = 1f
        out
      } catch { case _: Exception => java.util.Arrays.fill(out, 0f); out }
    }
  }

  /** WAV/PCM feature layout (first `dim` entries, zero-padded):
    * [0]=sample rate, [1]=sample count (per channel), [2]=channel count,
    * [3]=RMS amplitude in [0,1], [4]=peak |amplitude|, [5]=zero-crossing
    * rate, [6]=mean |amplitude|, [7]=duration seconds, [10]=decoded flag.
    * Decode is a RIFF chunk walk + little-endian PCM16 read — the WAV
    * container is a published spec; no codec library involved. */
  final class WavDecoder(val dim: Int = 12) extends MediaDecoder {
    require(dim >= 11, s"WavDecoder needs dim >= 11, got $dim")
    override def features(bytes: Array[Byte], kind: String, width: Int, height: Int): Array[Float] = {
      val out = new Array[Float](dim)
      try {
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        if (bytes.length < 44 || bb.getInt(0) != 0x46464952 /* "RIFF" LE */ ||
            bb.getInt(8) != 0x45564157 /* "WAVE" LE */ ) return out
        // chunk walk: find fmt and data
        var pos = 12
        var sampleRate = 0; var channels = 0; var bitsPerSample = 0
        var dataOff = -1; var dataLen = 0
        while (pos + 8 <= bytes.length) {
          val ckId = bb.getInt(pos); val ckLen = bb.getInt(pos + 4)
          // malformed negative length (ckLen -8/-9 would advance pos by 0)
          // must bail to the zero vector, not spin the task forever — the
          // per-row-degradation contract is that bad payloads cost one row
          if (ckLen < 0) return out
          if (ckId == 0x20746d66 /* "fmt " */ && pos + 8 + 16 <= bytes.length) {
            channels = bb.getShort(pos + 10).toInt
            sampleRate = bb.getInt(pos + 12)
            bitsPerSample = bb.getShort(pos + 22).toInt
          } else if (ckId == 0x61746164 /* "data" */ ) {
            dataOff = pos + 8; dataLen = math.min(ckLen, bytes.length - dataOff)
          }
          pos += 8 + ckLen + (ckLen & 1) // chunks are word-aligned
        }
        if (dataOff < 0 || channels <= 0 || bitsPerSample != 16) return out
        val frames = dataLen / (2 * channels)
        var ss = 0.0; var sAbs = 0.0; var peak = 0.0; var crossings = 0L
        var prevSign = 0
        var i = 0
        while (i < frames) {
          // mix down to mono for the stats
          var acc = 0.0
          var c = 0
          while (c < channels) { acc += bb.getShort(dataOff + 2 * (i * channels + c)); c += 1 }
          val s = acc / channels / 32768.0
          ss += s * s; sAbs += math.abs(s)
          if (math.abs(s) > peak) peak = math.abs(s)
          val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
          if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
          if (sign != 0) prevSign = sign
          i += 1
        }
        out(0) = sampleRate.toFloat
        out(1) = frames.toFloat
        out(2) = channels.toFloat
        if (frames > 0) {
          out(3) = math.sqrt(ss / frames).toFloat
          out(4) = peak.toFloat
          out(5) = (crossings.toDouble / frames).toFloat
          out(6) = (sAbs / frames).toFloat
          out(7) = (frames.toDouble / sampleRate).toFloat
        }
        out(10) = 1f
        out
      } catch { case _: Exception => java.util.Arrays.fill(out, 0f); out }
    }
  }

  /** Kind-dispatching decoder: `image` → [[ImageIoDecoder]], `audio` →
    * [[WavDecoder]]; anything else (video, compressed audio — formats the
    * bare JDK cannot parse) yields the zero vector with decoded flag 0. */
  final class JdkMediaDecoder(val dim: Int = 12) extends MediaDecoder {
    private val img = new ImageIoDecoder(dim)
    private val wav = new WavDecoder(dim)
    override def features(bytes: Array[Byte], kind: String, width: Int, height: Int): Array[Float] =
      kind match {
        case "image" => img.features(bytes, kind, width, height)
        case "audio" => wav.features(bytes, kind, width, height)
        case _       => new Array[Float](dim)
      }
  }

  // --------------------------------------------------------------------------
  // Deterministic synthetic payloads (tests/benchmarks — no external data)
  // --------------------------------------------------------------------------

  /** Deterministic image dimensions for [[syntheticPng]]: (16+id%17, 16+(id/17)%13). */
  def imageDims(id: Long): (Int, Int) =
    (16 + (id % 17).toInt, 16 + ((id / 17) % 13).toInt)

  /** A real PNG payload, deterministic from `id`: dimensions from
    * [[imageDims]], pixels from a 64-bit mix of (id, x, y). Encoded with
    * `javax.imageio` so the bytes are a genuine PNG stream. */
  def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = imageDims(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = id * 0x9e3779b97f4a7c15L + x * 0xc2b2ae3d27d4eb4fL + y * 0x165667b19e3779f9L
        z ^= z >>> 33; z *= 0xff51afd7ed558ccdL; z ^= z >>> 33
        img.setRGB(x, y, (z & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic WAV parameters for [[syntheticWav]]: (8000 Hz, 256+id%256 samples). */
  def wavParams(id: Long): (Int, Int) = (8000, 256 + (id % 256).toInt)

  /** A real RIFF/WAVE PCM16 mono payload, deterministic from `id`: a sine
    * at 100 + (id%50)·10 Hz, amplitude 0.5 full-scale. */
  def syntheticWav(id: Long): Array[Byte] = {
    val (rate, n) = wavParams(id)
    val freq = 100.0 + (id % 50) * 10.0
    val data = new Array[Byte](44 + 2 * n)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, 0x46464952)           // "RIFF"
    bb.putInt(4, 36 + 2 * n)
    bb.putInt(8, 0x45564157)           // "WAVE"
    bb.putInt(12, 0x20746d66)          // "fmt "
    bb.putInt(16, 16)
    bb.putShort(20, 1)                 // PCM
    bb.putShort(22, 1)                 // mono
    bb.putInt(24, rate)
    bb.putInt(28, rate * 2)            // byte rate
    bb.putShort(32, 2)                 // block align
    bb.putShort(34, 16)                // bits/sample
    bb.putInt(36, 0x61746164)          // "data"
    bb.putInt(40, 2 * n)
    var i = 0
    while (i < n) {
      bb.putShort(44 + 2 * i, (16384.0 * math.sin(2.0 * math.Pi * freq * i / rate)).toShort)
      i += 1
    }
    data
  }

  /** Attach a REAL deterministic media payload to each row: even ids carry a
    * genuine PNG, odd ids a genuine WAV (both synthesized from the id alone —
    * no external data). Generation runs inside `mapPartitions` so the
    * per-row encode work is distributed, exactly like a production decode. */
  def withRealMedia(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq ++ Seq(
      StructField("media", BinaryType, nullable = false),
      StructField("media_meta", mediaSchema, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    // Par.fanOut BEFORE synthesizing payloads: a single-file input batch
    // otherwise encodes (and every downstream decode pass decodes) all
    // media on one core (guide §2.5); the exchange moves the small doc
    // rows — the media bytes are generated post-shuffle and never move
    graft.Par.fanOut(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val (bytes, meta) =
          if (id % 2 == 0) {
            val (w, h) = imageDims(id)
            (syntheticPng(id), Row("image", w, h, 0, 0))
          } else {
            val (rate, n) = wavParams(id)
            (syntheticWav(id), Row("audio", 0, 0, rate, (n * 1000L / rate).toInt))
          }
        Row.fromSeq(r.toSeq ++ Seq(bytes, meta))
      }
    }(Encoders.row(outSchema))
  }

  /** Attach a deterministic OPAQUE payload (sha256 bytes — not a decodable
    * stream) to each row. Kept for plumbing tests/oracles that need the
    * payload bytes reproducible in plain SQL. */
  def withSyntheticMedia(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    df
      .withColumn("media", to_binary(
        sha2(concat(lit("media"), col(idCol).cast("string")), 256), lit("hex")))
      .withColumn("media_meta", struct(
        when(pmod(col(idCol), lit(2)) === 0, lit("image")).otherwise(lit("audio")).as("kind"),
        lit(64).cast("int").as("width"),
        lit(64).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"),
        (pmod(col(idCol), lit(5000)) + 100).cast("int").as("duration_ms")))
  }

  /** Batched feature extraction: one decoder instance per partition (the
    * expensive init happens once per task, not per row), rows streamed. */
  def extractFeatures(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "doc_id"
  ): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    df.mapPartitions { rows =>
      // decoder is deserialized once per partition here
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        Row(r.getLong(idIdx),
          decoder.features(r.getAs[Array[Byte]](mediaIdx),
            meta.getString(0), meta.getInt(1), meta.getInt(2)).toSeq)
      }
    }(Encoders.row(outSchema))
  }
}

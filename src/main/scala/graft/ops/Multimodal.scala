package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct; feature extraction runs batched in
  * `mapPartitions` behind a pluggable decoder.
  *
  * The actual codec libraries are not in this container, so `StubDecoder`
  * is a clearly-marked deterministic fake — the Spark-side contract (schema,
  * batch shape, partition behavior, determinism) is real and tested.
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
    * Implementations MUST be deterministic per (bytes, meta). */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def features(bytes: Array[Byte], kind: String, width: Int, height: Int): Array[Float]
  }

  /** STUB — not a real codec. Deterministic bytes→features fake standing in
    * for an image/audio decode (libraries unavailable in this sandbox). */
  final class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    override def features(bytes: Array[Byte], kind: String, width: Int, height: Int): Array[Float] = {
      val rng = new java.util.Random(
        java.util.Arrays.hashCode(bytes).toLong ^ (kind.hashCode.toLong << 32))
      Array.fill(dim)(rng.nextFloat() * 2f - 1f)
    }
  }

  /** Attach a deterministic synthetic media payload to each row (for tests
    * and benchmarks: derives bytes from the id — no external data). */
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

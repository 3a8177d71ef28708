package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in fixed-size batches (the Scala
  * analog of a Pandas-UDF-over-mapInPandas pipeline: same schema contract,
  * same batch shape, same partitioning discipline).
  *
  * The actual codec work is STUBBED — image/audio libraries are not
  * available in this environment — behind [[Decoder]], whose default
  * implementation produces deterministic fake features from the bytes.
  * The Spark-side contract (schemas, batching, null/corrupt handling,
  * partition sizing) is real and tested; swapping in a JNI/FFI decoder is
  * a one-class change.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),  // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)
  ))

  /** The stubbed codec boundary. A real build replaces `decode` with the
    * JNI/FFI call; everything around it stays.
    */
  trait Decoder extends Serializable {
    /** batch-in/batch-out, mirroring a vectorized (Arrow-batched) UDF */
    def decode(batch: Seq[(Long, String, Array[Byte])]): Seq[(Long, String, Int, Boolean, Array[Float])]
  }

  /** Deterministic fake: 8 floats derived from byte statistics. Corrupt
    * (null/empty) payloads yield ok=false with a null feature, exercising
    * the error channel the real decoder will use.
    */
  object FakeDecoder extends Decoder {
    def decode(batch: Seq[(Long, String, Array[Byte])]): Seq[(Long, String, Int, Boolean, Array[Float])] =
      batch.map { case (id, kind, bytes) =>
        if (bytes == null || bytes.isEmpty) (id, kind, 0, false, null)
        else {
          val feat = new Array[Float](8)
          var i = 0
          while (i < bytes.length) {
            feat(i % 8) += (bytes(i) & 0xff) / 255.0f
            i += 1
          }
          (id, kind, bytes.length, true, feat.map(_ / math.max(1, bytes.length / 8)))
        }
      }
  }

  /** Per-partition batched feature extraction. Batches bound peak memory
    * (a real decoder holds `batchSize` frames at once, not a partition).
    */
  def extractFeatures(media: DataFrame, decoder: Decoder = FakeDecoder,
                      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "kind", "bytes").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val batch = rows.map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)))
        decoder.decode(batch).map { case (id, kind, n, ok, feat) =>
          Row(id, kind, n, ok, if (feat == null) null else feat.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Deterministic synthetic media table for tests/benchmarks. */
  def synthMedia(spark: SparkSession, rows: Long, corruptEvery: Long = 97L): DataFrame = {
    val df = spark.range(0, rows).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
      when(pmod(col("id"), lit(corruptEvery)) === 3, lit(null).cast("binary"))
        .otherwise(unhex(conv(pmod(xxhash64(col("id")), lit(1000000000L)).cast("string"), 10, 16)))
        .as("bytes"),
      struct(lit(64).as("width"), lit(64).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")).as("meta"))
    df
  }
}

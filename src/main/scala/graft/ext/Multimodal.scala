package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-processed per partition.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic stub (`decodeStub`) — the Spark-side contract (schema,
  * partition-batch shape, null handling, metadata propagation) is real and
  * tested, and a production deployment swaps `decodeStub` for a JNI/codec
  * call (or `mapInPandas` + PIL on the PySpark binding) without touching
  * the pipeline.
  */
object Multimodal {

  /** Output schema of the decode/feature step. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload_bytes", IntegerType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(DoubleType, containsNull = false))))

  /** STUB decode: derives deterministic pseudo-metadata + an 8-dim feature
    * vector from the payload bytes. Replace with a real codec in
    * production — the signature (bytes -> metadata + feature) is the
    * contract. */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Array[Double]) = {
    val n = payload.length
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    val w = 16 + (n % 64)
    val h = 16 + ((n / 64) % 64)
    val feature = Array.tabulate(8) { i =>
      var acc = 0.0
      var j = i
      while (j < n) { acc += (payload(j) & 0xff) / 255.0; j += 8 }
      acc / math.max(1, (n + 7 - i) / 8)
    }
    (fmt, w, h, feature)
  }

  /** Decoded record produced by the UDF; encodes to the nullable-struct
    * half of [[featureSchema]]. */
  final case class Decoded(payload_bytes: Int, format: String,
                           width: Option[Int], height: Option[Int],
                           feature: Option[Seq[Double]])

  /** Decode + feature-extract a binary column. A struct-returning Scala
    * UDF rather than `rdd.mapPartitions`: the query stays on the
    * DataFrame/Tungsten plane, so column pruning still reaches the scan for
    * metadata-only consumers (e.g. [[resizePlan]] never deserialises the
    * payload bytes of OTHER columns) and the surrounding projections remain
    * whole-stage codegen'd. Expects (doc_id: long, payload: binary). */
  def decodeFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val decode = udf((payload: Array[Byte]) =>
      if (payload == null) Decoded(0, null, None, None, None)
      else {
        val (fmt, w, h, feat) = decodeStub(payload)
        Decoded(payload.length, fmt, Some(w), Some(h), Some(feat.toSeq))
      })
    df.select(col("doc_id").cast("long").as("doc_id"),
        decode(col(payloadCol)).as("d"))
      .select(col("doc_id"), col("d.payload_bytes").as("payload_bytes"),
        col("d.format").as("format"), col("d.width").as("width"),
        col("d.height").as("height"), col("d.feature").as("feature"))
  }

  /** Resize metadata transform (pure column math over the typed metadata —
    * no payload touch, so it prunes to the metadata columns at scan). */
  def resizePlan(features: DataFrame, maxSide: Int): DataFrame =
    features.withColumn("scale",
        least(lit(1.0), lit(maxSide.toDouble) /
          greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))

  /** Frame sampling plan for video-like payloads: every nth frame index up
    * to `frames`, exploded as (doc_id, frame_idx) work units. */
  def frameSamplePlan(features: DataFrame, everyNth: Int, frames: Int): DataFrame =
    features.select(col("doc_id"),
      explode(sequence(lit(0), lit(frames - 1), lit(everyNth))).as("frame_idx"))
}

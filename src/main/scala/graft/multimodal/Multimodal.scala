package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media record: an opaque binary payload plus typed metadata —
  * the schema shape a 100 TB multimodal corpus uses (payload stays an
  * un-decoded `binary` column until a decode stage needs it, so scans
  * that only touch metadata never deserialize media bytes).
  */
case class MediaRecord(
    doc_id: Long,
    format: String,          // "png" | "jpeg" | "wav"
    media: Array[Byte],
    declared_w: Int,
    declared_h: Int)

case class MediaFeatures(
    doc_id: Long,
    format: String,
    n_bytes: Long,
    mean_byte: Double,       // decode-stub feature
    n_frames: Int)           // frame-sample count

/** One sampled frame: a fixed-size byte slice + post-"resize" dims. */
case class MediaFrame(
    doc_id: Long,
    frame_idx: Int,
    frame: Array[Byte],
    width: Int,
    height: Int)

/** One media embedding with batch provenance: `batch_size` is the
  * actual size of the model-call batch this row rode in, `batch_idx`
  * its index within the partition — what a batching audit inspects.
  */
case class MediaEmbedding(
    doc_id: Long,
    batch_idx: Int,
    batch_size: Int,
    embedding: Array[Float])

/** Multimodal column plumbing: batch-shaped decode / feature-extract /
  * frame-sample over binary payloads via `mapPartitions` on a typed
  * `Dataset` (the Scala analogue of `mapInPandas` batch UDFs — one
  * iterator per partition, zero per-row task overhead, executor-local
  * library handles possible).
  *
  * The actual image/audio codec is STUBBED (no codec libs in this
  * container): `decodeStub` computes deterministic features from raw
  * bytes. The Spark-side contract — schema, partitioning, typed
  * encoders, per-partition batching — is real and tested; swap
  * `decodeStub` for a JNI/javacv call in production.
  */
object Multimodal {

  /** STUB decoder: deterministic fake standing in for e.g. libjpeg.
    * Features derive only from payload bytes so any engine can mirror
    * them: mean unsigned byte value and a frame count of one frame per
    * 32 bytes, capped at 8.
    */
  def decodeStub(media: Array[Byte]): (Double, Int) = {
    var sum = 0L
    var i = 0
    while (i < media.length) { sum += media(i) & 0xff; i += 1 }
    val mean = if (media.length == 0) 0.0 else sum.toDouble / media.length
    (mean, math.min(8, media.length / 32))
  }

  /** Feature extraction over the binary column, one partition at a
    * time. Stays a narrow transformation — no shuffle; at 100 TB this
    * is a pure map stage whose parallelism is the input partitioning.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (mean, frames) = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length.toLong, mean, frames)
      }
    }
  }

  val FrameBytes = 32
  val MaxFrames = 8

  /** Frame sampling + resize stub: every `FrameBytes` slice of the
    * payload becomes a "frame" (≈ video frame-sample / audio window),
    * capped at `MaxFrames`; the resize stub halves the declared dims.
    * Narrow flatMap — at 100 TB this stays a map stage whose output
    * is the exploded frame table downstream models train on.
    */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = math.min(MaxFrames, r.media.length / FrameBytes)
      (0 until n).map { i =>
        MediaFrame(r.doc_id, i,
          r.media.slice(i * FrameBytes, (i + 1) * FrameBytes),
          math.max(1, r.declared_w / 2), math.max(1, r.declared_h / 2))
      }
    }
  }

  val EmbedBatchSize = 16
  val EmbedDims = 8

  /** STUB batch "model call": one embedding per payload, derived only
    * from payload bytes (mean of each of `dims` byte chunks, scaled to
    * [0, 1]). Takes the whole batch at once — the signature a real
    * vision/audio encoder (ONNX/TensorRT server) has, so swapping the
    * stub for a real forward pass changes nothing upstream.
    */
  def embedBatchStub(batch: Seq[Array[Byte]], dims: Int): Seq[Array[Float]] =
    batch.map { bytes =>
      val out = new Array[Float](dims)
      if (bytes.nonEmpty) {
        val chunk = math.max(1, (bytes.length + dims - 1) / dims)
        var d = 0
        while (d < dims) {
          var sum = 0L; var n = 0; var i = d * chunk
          val end = math.min(bytes.length, (d + 1) * chunk)
          while (i < end) { sum += bytes(i) & 0xff; n += 1; i += 1 }
          out(d) = if (n == 0) 0f else (sum.toFloat / n) / 255f
          d += 1
        }
      }
      out
    }

  /** Batched embedding extraction — the GPU-inference plumbing shape:
    * each partition's iterator is re-chunked into fixed
    * [[EmbedBatchSize]] batches (`grouped` — ONE buffered batch in
    * memory at a time, never the partition), the stub model is called
    * once per batch, and rows flatten back out with batch provenance
    * so a shape audit can assert exactly what a model server would
    * have seen. Narrow transformation: no shuffle, parallelism = input
    * partitioning; at 100 TB the only tuning knobs are partition size
    * (executor memory) and batch size (model-server throughput).
    *
    * Embeddings depend ONLY on the payload — never on batch
    * composition or partitioning — so repartitioning reshapes batches
    * without changing a single output vector (spec-pinned; the
    * property that makes retries/speculative tasks safe).
    */
  def batchedEmbed(media: Dataset[MediaRecord],
                   batchSize: Int = EmbedBatchSize,
                   dims: Int = EmbedDims): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
        val embs = embedBatchStub(batch.map(_.media), dims)
        batch.lazyZip(embs).map { (m, e) =>
          MediaEmbedding(m.doc_id, bi, batch.size, e)
        }
      }
    }
  }

  /** Builds a media table from `documents`: payload = UTF-8 bytes of
    * the text (a deterministic opaque-binary stand-in), format cycled
    * by doc_id, declared dims derived from length. Real pipelines read
    * `binaryFile` / parquet-with-binary instead.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        encode(col("text"), "UTF-8").as("media"),
        (lit(64) + (col("doc_id") % 16) * 8).cast("int").as("declared_w"),
        (lit(64) + (col("doc_id") % 9) * 8).cast("int").as("declared_h"))
      .as[MediaRecord]
  }
}

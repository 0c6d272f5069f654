package graft.ops

import graft.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token statistics, fingerprinting. All columnar
  * (one narrow stage), no shuffle.
  */
object TextAnalysis {

  /** Adds lang_pred, n_tokens, quality, fingerprint columns. */
  def annotate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", gr_langId(col(textCol)))
      .withColumn("n_tokens", gr_tokenCount(col(textCol)))
      .withColumn("quality", gr_qualityScore(col(textCol)))
      .withColumn("fingerprint", gr_fingerprint(col(textCol), lit(8)))

  /** Corpus-level stats per predicted language. */
  def langProfile(df: DataFrame, textCol: String): DataFrame =
    annotate(df, textCol)
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        round(avg(col("quality")), 4).as("avg_quality"))
}

/** Multimodal column plumbing: images/audio/video ride as opaque binary
  * columns with typed metadata extracted by per-row kernels. The decode
  * kernel here is a deterministic STUB (`gr_fake_image_meta`) because no
  * codec libraries ship in this build environment — the Spark-side shape
  * (binary column, struct schema, narrow-stage extraction, partition
  * sizing) is the real, tested part.
  */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of a text column —
    * stand-in for real image bytes read from files).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, encode(col(srcCol), "UTF-8").cast("binary"))

  /** Extract typed metadata from the binary column. Real implementation
    * would decode image headers; the stub derives deterministic values from
    * payload length so the pipeline is testable end-to-end.
    */
  def extractImageMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("image_meta", gr_fakeImageMeta(col(binCol)))
      .withColumn("width", col("image_meta.width"))
      .withColumn("height", col("image_meta.height"))
      .withColumn("channels", col("image_meta.channels"))
      .drop("image_meta")

  /** Partition-wise BATCHED decode — the Spark analog of the reference's
    * `map_partitions` (SURVEY §2.10) and of mapInPandas-style batch UDFs:
    * rows stream through in groups of `batchSize`, which is where a real
    * decoder would amortize codec/model setup or vectorize. The decode
    * itself is the deterministic stub (no codec libs in this build).
    */
  def extractImageMetaBatched(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val (w, h, c) = graft.sql.FakeCodec.meta(bytes.length)
            (id, w, h, c)
          }
        }
      }
      .toDF(idCol, "width", "height", "channels")
  }

  /** "Resize" stub: deterministic fit-into-target output dims + byte size
    * (integer math over the fake-decoded dims). Real codecs would replace
    * the kernel; the narrow-stage plumbing and schema are the tested part.
    */
  def resizeMeta(df: DataFrame, binCol: String, target: Int): DataFrame =
    df.withColumn("resize_meta", gr_fakeResize(col(binCol), lit(target)))
      .withColumn("out_w", col("resize_meta.out_w"))
      .withColumn("out_h", col("resize_meta.out_h"))
      .withColumn("out_bytes", col("resize_meta.out_bytes"))
      .drop("resize_meta")

  /** Video frame-sampling stub: probe the (fake) container for frame count,
    * emit a uniform stride of frame indices toward `targetFrames`. A real
    * pipeline replaces the probe/extract kernel; the narrow stage, struct +
    * array schema, and downstream explode-ability are the tested shape.
    */
  def frameSample(df: DataFrame, binCol: String, targetFrames: Int): DataFrame =
    df.withColumn("fs", gr_fakeFrameSample(col(binCol), lit(targetFrames)))
      .withColumn("n_frames", col("fs.n_frames"))
      .withColumn("frame_indices", col("fs.indices"))
      .drop("fs")
}

package graft.udf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable model-inference ring (SURVEY.md §2.11).
  *
  * The reference calls LLM/OCR/vision/embedding APIs per block with
  * deterministic rule-based fallbacks (classifier
  * `ingestion/document_classifier.py:87-183`, section tagging
  * `ingestion/semantic_enricher.py:81-118`, raw-snippet answer fallback
  * `backend/services/rag.py:727-743`). Our engine inverts that: the
  * deterministic rules ARE the native Catalyst path (see `graft.ops`), and
  * model inference is an optional `mapPartitions` stage behind this trait —
  * batched per partition, lazy-initialized per executor (the ref's
  * client/token caches become executor-local singletons).
  */
trait ModelStage extends Serializable {
  /** Batch-transform a partition of inputs (e.g. texts → labels/vectors).
    * Implementations own batching, retry, and rate limiting internally. */
  def transformBatch(inputs: Iterator[String]): Iterator[String]
}

/** Identity/echo stage — the no-model default. */
object EchoStage extends ModelStage {
  def transformBatch(inputs: Iterator[String]): Iterator[String] = inputs
}

object ModelStage {

  /** Run a model stage over one string column, appending the output column.
    * Executor-side batching via mapPartitions; everything else in the row
    * is carried through untouched. The deterministic `fallback` column
    * expression is used where the stage emits null/empty. */
  def applyStage(df: DataFrame, inCol: String, outCol: String, stage: ModelStage,
                 fallback: Column, batchSize: Int = 1024): DataFrame = {
    val inIdx = df.schema.fieldIndex(inCol)
    val outSchema = df.schema.add(outCol, org.apache.spark.sql.types.StringType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    // bounded batches (never the whole partition on heap); null inputs
    // bypass the stage entirely and emit null so the fallback column fires
    val out = df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val present = batch.filter(r => !r.isNullAt(inIdx))
        val outputs = stage.transformBatch(present.iterator.map(_.getString(inIdx)))
        batch.iterator.map { r =>
          val o = if (r.isNullAt(inIdx)) null else outputs.next()
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ o)
        }
      }
    }(enc)
    out.withColumn(outCol,
      when(col(outCol).isNull || col(outCol) === "", fallback).otherwise(col(outCol)))
  }
}

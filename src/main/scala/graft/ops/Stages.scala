package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructField

/** Shared plumbing for row-wise executor-side stages (the PDF build /
  * extract and OCR preprocess seams): append computed fields to each row
  * through one `mapPartitions` with a single RowEncoder. Rows stream one
  * at a time — a row-wise `f` needs no batch buffering, so peak memory is
  * one input row plus its output (the batched variant for extractors that
  * genuinely consume payload BATCHES lives in
  * [[Multimodal.extractFeatures]]). */
object Stages {

  def appendFields(df: DataFrame, newFields: Seq[StructField])(f: Row => Seq[Any]): DataFrame = {
    val outSchema = newFields.foldLeft(df.schema)(_ add _)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions(rows => rows.map(r => Row.fromSeq(r.toSeq ++ f(r))))(enc)
  }

  /** One input row → N output rows, each the input row plus one of `f`'s
    * extension tuples (the row-wise explode for container payloads like
    * [[Avi.frameStatsStage]] where one binary yields per-member rows).
    * Output rows stream through the same single-encoder mapPartitions.
    *
    * Caller convention (every container stage follows it): an empty `f`
    * result drops the input row entirely, so a VALID-but-empty container
    * must emit one marker tuple — by convention a NON-null struct with
    * null members, distinguishable from both the malformed case (null
    * struct) and an absent payload (no row). */
  def explodeFields(df: DataFrame, newFields: Seq[StructField])(f: Row => Seq[Seq[Any]]): DataFrame = {
    val outSchema = newFields.foldLeft(df.schema)(_ add _)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions(rows =>
      rows.flatMap(r => f(r).iterator.map(ext => Row.fromSeq(r.toSeq ++ ext))))(enc)
  }
}

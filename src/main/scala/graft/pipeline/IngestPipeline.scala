package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.index.Embed

/** The full ingest lifecycle as one lazy DataFrame DAG (SURVEY.md §3.1):
  *
  *   text blocks → clean (P1/P2) → reading order (W1) → font median /
  *   heading (A1/F2) → block type (F1) → section forward-fill (W3) →
  *   intent (A7/F4) → chunk boundaries (W4) → chunk rollup (A6) →
  *   fingerprint dedup (J2/F13) → deterministic embedding (V1)
  *
  * The reference runs these as sequential per-document scripts with JSON
  * materialization between stages; here they compose into a single plan
  * with exactly two shuffles — one hash partition by (doc_id) shared by
  * every window stage (they use the same partitioning+sort), and one for
  * the final chunk aggregation. Partitioning is by doc_id, so no window
  * ever spans documents and the pipeline scales with document count.
  */
object IngestPipeline {

  final case class Config(
    maxChunkChars: Long = 1200,
    vocab: Seq[String] = Seq("spark", "join", "stream", "hash", "sort", "vector"),
    intents: Seq[(String, String)] = Seq("agg" -> "agg", "join" -> "join", "scan" -> "scan", "sort" -> "sort"))

  /** blocks: (doc_id, page, ord0, content, font_size, y0, x0) — ord0 any
    * stable per-doc tiebreak (e.g. parse order). Returns chunk rows with
    * embeddings: (doc_id, chunk_id, content, section, n_blocks, n_chars,
    * fingerprint, embedding). */
  def run(blocks: DataFrame, cfg: Config = Config()): DataFrame = {
    // P1/P2: normalize, drop noise
    val cleaned = blocks
      .withColumn("content", Cleaning.normalizeText(col("content")))
      .filter(!Cleaning.isNoise(col("content")))

    // W1: reading order — page first, then the y-bucket (y0 recycles on
    // every page, so bucketing by y alone would interleave pages)
    val ordered = Layout.readingOrder(cleaned, Seq(col("doc_id")),
      struct(col("page"), floor(col("y0") / 12)), col("x0"), col("ord0"))

    // A1+F2: heading detection against the per-doc font median
    val withMedian = Layout.partitionMedian(ordered, Seq(col("doc_id")), col("font_size"), "font_med")
    val tagged = withMedian
      .withColumn("is_heading", Layout.isHeading(col("font_size"), col("font_med"), col("content")))
      .withColumn("block_type", Layout.blockType(col("content")))

    // W3: section forward-fill from headings (normalized title)
    val sectioned = Sections.forwardFill(tagged, Seq(col("doc_id")), col("ord"),
      when(col("is_heading"), Cleaning.normalizeSectionTitle(col("content"))), "section")

    // A7/F4: intent scoring
    val withIntent = sectioned
      .withColumn("intents", Sections.intentScores(col("content"), cfg.intents))
      .withColumn("primary_intent", Sections.primaryIntent(col("intents")))

    // W4: chunk boundaries — break on section change or char overflow
    val sectionChanged = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("ord"))
      !(lag(col("section"), 1).over(w) <=> col("section"))
    }
    val chunked = Chunking.chunkIdApprox(
      withIntent.withColumn("sec_break", sectionChanged),
      Seq(col("doc_id")), col("ord"), length(col("content")),
      col("sec_break"), cfg.maxChunkChars)

    // A5/A6: assemble chunk content + rollup
    val chunks = chunked.groupBy(col("doc_id"), col("chunk_id"))
      .agg(
        concat_ws("\n", sort_array(collect_list(struct(col("ord").as("o"), col("content").as("c"))))
          .getField("c")).as("content"),
        min(col("page")).as("page"),
        first(col("section"), ignoreNulls = true).as("section"),
        sort_array(collect_set(col("block_type"))).as("block_types"),
        count(lit(1)).as("n_blocks"),
        sum(length(col("content"))).as("n_chars"))

    // J2/F13: fingerprint dedup, deterministic first-wins by (doc_id, chunk_id)
    val withFp = chunks.withColumn("fingerprint",
      Chunking.fingerprint(lower(col("content")), lit("|"), coalesce(col("section"), lit(""))))
    val deduped = TableOps.dedupByHash(withFp, col("fingerprint"), col("doc_id"), col("chunk_id"))

    // V1: deterministic lexical embedding, L2-normalized
    deduped
      .withColumn("vec", Embed.vocabVector(col("content"), cfg.vocab))
      .withColumn("embedding", Embed.l2Normalize(col("vec")))
      .drop("vec")
  }

  /** Synthesize text blocks from the testdata documents table (documents ↦
    * one block per sentence-ish slice) — the fixture generator used by the
    * pipeline test and the flagship entry. */
  def blocksFromDocuments(spark: SparkSession, dir: String): DataFrame =
    blocksFromFrame(graft.tables.TestTables.documents(spark, dir))

  /** Same synthetic flattening over an arbitrary (doc_id, text) frame —
    * lets the flagship run the curation stage BEFORE ingest. */
  def blocksFromFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), "(?<=\\w) (?=batch|stream|join|table)"))
        .as(Seq("ord0", "content")))
      .withColumn("page", (col("ord0") / 5).cast("int"))
      .withColumn("font_size", when(col("ord0") % 7 === 0, 18.0).otherwise(10.0))
      .withColumn("y0", (col("ord0") % 5) * 150.0 + 60.0)
      .withColumn("x0", lit(72.0))
}

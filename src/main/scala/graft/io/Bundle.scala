package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** Document-bundle reader/writer (SURVEY.md §2.1 S4/S5, §1.3; ref
  * `backend/services/loader.py:38-153`, `scripts/run_ingestion.py:64-86`).
  *
  *  - Stage-priority file pick: text_enriched > text_clean > text (ref
  *    `loader.py:74-124`) — resolved once on the driver, then one schema'd
  *    PERMISSIVE JSON read for the chosen stage across all docs.
  *  - Alias coalescing: `columns`|`header`, `markdown`|`markdown_content`,
  *    `file_path`|`image_path` (ref `schema.py:189-197,258-270,354-371`).
  *  - Enum normalization with defaults (`numeric_trust` → unknown,
  *    ref `schema.py:273-278`).
  *  - J3 metadata backfill: blocks inherit `doc_type` from the broadcast
  *    documents dim via `coalesce`.
  *
  * At scale: bundles land as JSON only at the ingest boundary; everything
  * downstream is parquet partitioned by `doc_id` prefix (a thousand-bucket
  * hash of doc_id, not raw doc_id — millions of tiny partitions would
  * overwhelm the file listing).
  */
object Bundle {

  /** Stage-priority resolution: first candidate with any existing file. */
  def bestAvailable(spark: SparkSession, dir: String, candidates: Seq[String]): Option[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    // globStatus returns null (not empty) when nothing matches
    candidates.find(c => Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/$c")))
        .exists(_.nonEmpty))
      .map(c => s"$dir/$c")
  }

  val textStages: Seq[String]  = Seq("text_enriched.json", "text_clean.json", "text.json")
  val tableStages: Seq[String] = Seq("table_normalized.json", "table_clean.json", "table.json")

  def readTextBlocks(spark: SparkSession, dir: String): DataFrame = {
    val path = bestAvailable(spark, dir, textStages)
      .getOrElse(throw new IllegalArgumentException(s"no text stage file under $dir"))
    spark.read.schema(Schemas.textBlock).option("mode", "PERMISSIVE").option("multiLine", true).json(path)
  }

  def readTableBlocks(spark: SparkSession, dir: String): DataFrame = {
    val path = bestAvailable(spark, dir, tableStages)
      .getOrElse(throw new IllegalArgumentException(s"no table stage file under $dir"))
    val raw = spark.read.schema(Schemas.tableBlock).option("mode", "PERMISSIVE").option("multiLine", true).json(path)
    raw
      .withColumn("columns", coalesce(col("columns"), col("header"))).drop("header")
      .withColumn("markdown", coalesce(col("markdown"), col("markdown_content"))).drop("markdown_content")
      .withColumn("numeric_trust",
        when(lower(col("numeric_trust")).isin(Schemas.numericTrustValues: _*), lower(col("numeric_trust")))
          .otherwise("unknown"))
      // flag inference when absent (ref schema.py:280-303)
      .withColumn("structured_available",
        coalesce(col("structured_available"), col("rows").isNotNull && size(col("rows")) > 0))
      .withColumn("raw_available",
        coalesce(col("raw_available"), col("markdown").isNotNull || col("html_content").isNotNull))
  }

  def readImageBlocks(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Schemas.imageBlock).option("mode", "PERMISSIVE").option("multiLine", true).json(s"$dir/image.json")
      .withColumn("file_path", coalesce(col("file_path"), col("image_path"))).drop("image_path")

  def readMetadata(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Schemas.documentMeta).option("mode", "PERMISSIVE").option("multiLine", true).json(s"$dir/metadata.json")

  /** J3: backfill doc_type (and any listed dim column) from the broadcast
    * documents dim; block-level values win when present. */
  def backfillFromMetadata(blocks: DataFrame, meta: DataFrame, cols: Seq[String] = Seq("doc_type")): DataFrame = {
    val dim = meta.select((Seq(col("doc_id").as("_m_doc_id")) ++ cols.map(c => col(c).as(s"_m_$c"))): _*)
    val joined = blocks.join(broadcast(dim), blocks("doc_id") === col("_m_doc_id"), "left")
    val filled = cols.foldLeft(joined) { (df, c) =>
      if (blocks.columns.contains(c)) df.withColumn(c, coalesce(col(c), col(s"_m_$c")))
      else df.withColumn(c, col(s"_m_$c"))
    }
    filled.drop("_m_doc_id" +: cols.map(c => s"_m_$c"): _*)
  }

  /** S5: columnar persistence, bucketed by doc hash so partition counts
    * stay bounded regardless of document count. */
  def writeBundle(df: DataFrame, out: String, buckets: Int = 256): Unit =
    df.withColumn("doc_bucket", pmod(hash(col("doc_id")), lit(buckets)))
      .write.mode("overwrite").partitionBy("doc_bucket").parquet(out)

  /** Training-shard export: bounded-size files, the format a data-loader
    * fleet actually reads. `repartition(shards)` fixes the writer-task
    * count (too many tasks → a small-files explosion that throttles any
    * 100 TB consumer on file-open latency; too few → no read parallelism)
    * and `maxRecordsPerFile` caps records per file so one skewed writer
    * task still cannot emit a giant shard — the two knobs that control
    * file sizing at scale. Rows are spread round-robin, so shard sizes are
    * even by construction. */
  def writeShards(df: DataFrame, out: String, shards: Int, maxRecordsPerFile: Long): Unit =
    df.repartition(shards)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(out)

  /** Co-located join persistence: save as a bucketed+sorted table so
    * repeated joins/aggregations on `key` run with NO exchange — the
    * canonical 100 TB pattern for fact tables that are joined on the same
    * key every query (blocks ⋈ chunks ⋈ embeddings on doc/chunk id).
    * Requires a table catalog (saveAsTable); plain parquet paths cannot
    * carry bucket metadata. */
  def writeBucketedTable(df: DataFrame, table: String, key: String, buckets: Int = 64): Unit = {
    val spark = df.sparkSession
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    // A stale warehouse dir with no catalog entry (e.g. from a previous
    // session) makes saveAsTable fail with LOCATION_ALREADY_EXISTS, so the
    // real location must be cleared. But the location is only guessable by
    // convention when no catalog entry exists: an EXTERNAL table's data
    // must survive the drop, and a custom-LOCATION database breaks the
    // convention path — so resolve through the catalog first.
    val meta =
      if (spark.catalog.tableExists(table))
        Some(spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table)))
      else None
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val locToClear: Option[org.apache.hadoop.fs.Path] = meta match {
      case Some(m) if m.tableType == CatalogTableType.MANAGED =>
        // DROP already deleted it; clear again defensively (some Hadoop
        // FS impls leave empty dirs) using the CATALOG's location
        Some(new org.apache.hadoop.fs.Path(m.location))
      case Some(_) => None // EXTERNAL: DROP preserves data — never delete
      case None =>
        // no catalog entry: orphaned dir from a crashed session — fall
        // back to the metastore's naming convention (lowercase names,
        // databases as <db>.db/ directories)
        val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        val relative = table.toLowerCase.split('.') match {
          case Array(db, t) => s"$db.db/$t"
          case Array(t) => t
          case parts => parts.mkString("/")
        }
        Some(new org.apache.hadoop.fs.Path(s"$warehouse/$relative"))
    }
    locToClear.foreach { loc =>
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }
}

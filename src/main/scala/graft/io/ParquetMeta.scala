package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet footer introspection — row-group / column-chunk metadata as a
  * DataFrame (what `parquet-tools meta` prints, and what a lakehouse
  * stats layer ingests to build the dl3-style file-skipping index when
  * the table has no transaction log yet: scan footers once, persist the
  * min/max/null ledger, prune forever after).
  *
  * Reads through the PUBLIC parquet-hadoop API (`ParquetFileReader` —
  * the jars ship with Spark); cross-checked against DuckDB's independent
  * `parquet_metadata()` reader in the pq1 gate.
  *
  * Scale shape: footers are KB-sized regardless of file size, and the
  * work is one footer read per FILE — so the paths are distributed as a
  * Dataset and each executor opens only its own files (the Delta stats
  * collection shape). No row data is ever read.
  */
object ParquetMeta {

  case class ChunkMeta(file: String, row_group_id: Int, n_rows: Long, col_path: String,
                       num_values: Long, null_count: Long, compressed: Long, uncompressed: Long)

  /** List the .parquet part files under a directory (non-recursive).
    * Listed through the Hadoop FileSystem API — the same path resolution
    * [[footerMeta]] reads through — so an hdfs:// or s3a:// directory
    * lists correctly instead of silently yielding an empty local
    * listing. The active Spark session's hadoopConfiguration is used
    * when present (remote filesystems carry credentials/endpoints via
    * spark.hadoop.*); a missing directory lists as empty. Every entry is
    * returned FULLY QUALIFIED (`fs.makeQualified` — scheme + authority):
    * a bare path re-resolves through fs.defaultFS at READ time, so a
    * session that reconfigures its default filesystem between list and
    * read would silently open the same string against a different
    * filesystem. */
  def partFiles(dir: String): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return Seq.empty
    val status = fs.getFileStatus(path)
    val files = if (status.isFile) Array(status) else fs.listStatus(path)
    files.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => fs.makeQualified(s.getPath).toString).sorted.toSeq
  }

  /** Footer metadata for every column chunk of every row group of the
    * given files, computed ON THE EXECUTORS (one task can own many
    * files; only footer-sized rows come back). The session's Hadoop
    * settings (spark.hadoop.* — remote-FS credentials/endpoints) ride to
    * the executors as a plain key/value capture, so a path [[partFiles]]
    * could list is a path this can open. */
  def footerMeta(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val confEntries: Seq[(String, String)] =
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toSeq
    // one Hadoop Configuration per PARTITION, not per file: the default
    // XML-resource parse is pure overhead repeated 10k+ times on a real
    // file listing
    paths.toDS().mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      it.flatMap { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val name = new java.io.File(p).getName
          reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap { case (block, rg) =>
            block.getColumns.asScala.toSeq.map { c =>
              ChunkMeta(name, rg, block.getRowCount, c.getPath.toDotString,
                c.getValueCount,
                Option(c.getStatistics).map(_.getNumNulls).getOrElse(-1L),
                c.getTotalSize, c.getTotalUncompressedSize)
            }
          }
        } finally reader.close()
      }
    }.toDF()
  }
}

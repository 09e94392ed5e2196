package graft

import org.apache.spark.sql.functions._
import graft.io.Bundle
import graft.pipeline.IngestPipeline
import java.nio.file.{Files, Paths}

class BundlePipelineSpec extends SparkSpec {

  private def writeFixture(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/metadata.json"),
      """{"doc_id":"doc_a","file_name":"a.pdf","doc_type":"invoice","page_count":2,"source":"uploaded"}""")
    // stage priority: only text_clean exists (not text_enriched) plus legacy text.json
    Files.writeString(Paths.get(s"$dir/text.json"),
      """[{"id":"t1","doc_id":"doc_a","page":1,"content":"OLD STAGE"}]""")
    Files.writeString(Paths.get(s"$dir/text_clean.json"),
      """[{"id":"t1","doc_id":"doc_a","page":1,"content":"Total Amount: 1,234.50 baht"},
         {"id":"t2","doc_id":"doc_a","page":1,"content":"WARNING: hot surface"}]""".stripMargin)
    // table with LEGACY alias fields: header (not columns), markdown_content
    Files.writeString(Paths.get(s"$dir/table.json"),
      """[{"id":"tb1","doc_id":"doc_a","page":2,"header":["date","amount"],
          "rows":[["2024-01-01","10.00"],["2024-01-02","20.00"]],
          "markdown_content":"|date|amount|","numeric_trust":"HIGH"},
         {"id":"tb2","page":2,"rows":[["x","y"]],"numeric_trust":"bogus"}]""")
    Files.writeString(Paths.get(s"$dir/image.json"),
      """[{"id":"im1","doc_id":"doc_a","page":1,"image_path":"images/img_p001_001.png"}]""")
  }

  test("Bundle reader: stage priority, alias coalescing, enum defaults, backfill") {
    val dir = "/tmp/graft_bundle_fixture"
    writeFixture(dir)
    val texts = Bundle.readTextBlocks(spark, dir)
    assert(texts.count() == 2)
    assert(texts.filter(col("content") === "OLD STAGE").count() == 0, "must pick text_clean over text")

    val tables = Bundle.readTableBlocks(spark, dir)
    val tb1 = tables.filter(col("id") === "tb1").collect()(0)
    assert(tb1.getSeq[String](tb1.fieldIndex("columns")).toSeq == Seq("date", "amount"), "header alias → columns")
    assert(tb1.getAs[String]("markdown") == "|date|amount|", "markdown_content alias")
    assert(tb1.getAs[String]("numeric_trust") == "high", "enum lowercased")
    assert(tb1.getAs[Boolean]("structured_available"), "flag inferred from rows")
    val tb2 = tables.filter(col("id") === "tb2").collect()(0)
    assert(tb2.getAs[String]("numeric_trust") == "unknown", "bogus enum → default")

    val images = Bundle.readImageBlocks(spark, dir)
    assert(images.collect()(0).getAs[String]("file_path").endsWith(".png"), "image_path alias")

    val meta = Bundle.readMetadata(spark, dir)
    val backfilled = Bundle.backfillFromMetadata(tables, meta)
    val types = backfilled.select("id", "doc_type").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("tb1") == "invoice", "doc_type backfilled from metadata")
    assert(backfilled.filter(col("id") === "tb2").collect()(0).isNullAt(
      backfilled.columns.indexOf("doc_type")), "tb2 has no doc_id → no backfill")
  }

  test("Bundle writer: bucketed partitioning bounds partition count") {
    val docs = graft.tables.TestTables.documents(spark, sf)
    val out = "/tmp/graft_bundle_out"
    Bundle.writeBundle(docs, out, buckets = 8)
    val dirs = new java.io.File(out).listFiles().count(f => f.getName.startsWith("doc_bucket="))
    assert(dirs > 0 && dirs <= 8)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
  }

  test("shard export bounds file count and records per file, loses nothing") {
    val docs = graft.tables.TestTables.documents(spark, sf) // 500 rows at sf0.01
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/shards"
    Bundle.writeShards(docs, out, shards = 4, maxRecordsPerFile = 100L)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    // 4 writer tasks x ~125 rows each / 100-record cap -> 2 files per task
    assert(files.length >= 5 && files.length <= 8,
      s"expected the 100-record cap to split each of 4 even shards once, got ${files.length} files")
    val counts = files.map(f => spark.read.parquet(f.getPath).count())
    assert(counts.forall(_ <= 100L), s"every file must respect maxRecordsPerFile: ${counts.toSeq}")
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("bucketed tables join with no exchange (co-located join)") {
    val docs = graft.tables.TestTables.documents(spark, sf)
    val emb = graft.tables.TestTables.embeddings(spark, sf)
      .withColumnRenamed("vec_id", "doc_id")
    Seq("b_docs", "b_emb").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"spark-warehouse/$t"))
    }
    Bundle.writeBucketedTable(docs, "b_docs", "doc_id", buckets = 8)
    Bundle.writeBucketedTable(emb, "b_emb", "doc_id", buckets = 8)
    // force the sort-merge path (small test tables would otherwise broadcast,
    // which sidesteps bucketing entirely); at fact×fact scale SMJ is what runs
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_docs").join(spark.table("b_emb"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed SMJ must not shuffle either side:\n$plan")
      assert(joined.count() == emb.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IngestPipeline end-to-end: blocks → sections → chunks → embeddings") {
    val blocks = IngestPipeline.blocksFromDocuments(spark, sf)
    val chunks = IngestPipeline.run(blocks)
    assert(chunks.count() > 0)
    // every chunk respects the char budget at block granularity (approx form:
    // a single oversized block may exceed, but multi-block chunks shouldn't wildly)
    val stats = chunks.agg(max(col("n_blocks")).as("mb"), max(length(col("embedding").cast("string")))).collect()(0)
    assert(stats.getLong(0) >= 1)
    // embeddings are L2-normalized (or zero)
    val norms = chunks.select(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x).as("n2"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9 || n == 0.0))
    // dedup idempotence: running the fingerprint dedup again removes nothing
    val again = graft.ops.TableOps.dedupByHash(chunks, col("fingerprint"), col("doc_id"), col("chunk_id"))
    assert(again.count() == chunks.count())
  }
}

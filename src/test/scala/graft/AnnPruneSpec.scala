package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.index.{Embed, Search}

/** Proves the ANN partition-prune path end-to-end: the index written
  * `partitionBy(bucket)` is read back with the query's bucket arriving as a
  * partition filter, so the scan lists a strict subset of the partition
  * directories (not the whole index).
  */
class AnnPruneSpec extends SparkSpec {

  private val dim = 64
  private val bits = 6

  private def indexScan(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // force execution so AQE finalizes the plan
    def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case s: QueryStageExec => find(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => (other.children ++ other.subqueries).flatMap(find)
    }
    val scans = find(df.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.nonEmpty) // the partitioned index side
    assert(scans.nonEmpty, "expected a partitioned file scan in the plan")
    scans.head
  }

  test("SRP index written partitionBy(bucket) is read with partition filters") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_prune_spec_srp"
    Search.writePartitionedIndex(emb, Search.srpBucket(col("embedding"), dim, bits), out)

    val nBuckets = spark.read.parquet(out).select("bucket").distinct().count()
    assert(nBuckets > 1, "test needs a multi-partition index to demonstrate pruning")

    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), Search.srpBucket(col("embedding"), dim, bits).as("bucket"))
    val pruned = Search.readPruned(spark, out, q)
      .select(col("vec_id"), round(Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(5)

    val scan = indexScan(pruned)
    assert(scan.partitionFilters.nonEmpty,
      s"bucket predicate must reach the scan as a partition filter, got: ${scan.partitionFilters}")
    // file-level proof: the pruned scan read fewer partition directories
    // than the index has (dynamic filter resolves to exactly one bucket)
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = {
      import java.nio.file._
      val s = Files.walk(Paths.get(out))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    assert(filesRead < totalFiles,
      s"pruned read touched $filesRead of $totalFiles files - no pruning happened")
  }

  test("pruned top-k equals the in-scan LSH top-k (same bucket, same ranking)") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_prune_spec_srp"
    // self-contained: never rely on a previous test's (or a previous
    // BUILD's) index at this fixed path
    Search.writePartitionedIndex(emb, Search.srpBucket(col("embedding"), dim, bits), out)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), Search.srpBucket(col("embedding"), dim, bits).as("bucket"))
    val pruned = Search.readPruned(spark, out, q)
      .select(col("vec_id"), round(Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(5).collect()

    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val reference = emb.crossJoin(broadcast(qv))
      .withColumn("bucket", Search.srpBucket(col("embedding"), dim, bits))
      .filter(col("bucket") === Search.srpBucket(transform(col("qv"), x => x.cast("double")), dim, bits))
      .select(col("vec_id"), round(Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(5).collect()

    assert(pruned.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      reference.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("multi-probe pruned read scans neighbor buckets only, matches in-scan multi-probe") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_prune_spec_srp"
    Search.writePartitionedIndex(emb, Search.srpBucket(col("embedding"), dim, bits), out)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), Search.srpBucket(col("embedding"), dim, bits).as("bucket"))
    val pruned = Search.readPrunedMultiProbe(spark, out, q, bits, maxHamming = 1)
      .withColumn("score", Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))))
      .orderBy(col("score").desc, col("vec_id")).limit(5)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
    val scan = indexScan(pruned)
    assert(scan.partitionFilters.nonEmpty)
    // probes = bucket + `bits` single-flip neighbors; must stay under the full index
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = {
      import java.nio.file._
      val s = Files.walk(Paths.get(out))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    assert(filesRead <= bits + 1 && filesRead < totalFiles,
      s"multi-probe read $filesRead of $totalFiles files")
    val reference = Search.lshTopK(
      emb.crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("qv")))),
      "embedding", "vec_id", transform(col("qv"), x => x.cast("double")), dim, bits, 5, maxHamming = 1)
      .select(col("vec_id"), round(col("score"), 6).as("score")).collect()
    assert(pruned.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      reference.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("IVF index written partitionBy(cell) prunes the same way") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val centroids: Seq[Seq[Double]] = {
      val rng = new scala.util.Random(7)
      Seq.fill(4)(Seq.fill(dim)(rng.nextGaussian() * 0.05))
    }
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_prune_spec_ivf"
    Search.writePartitionedIndex(emb, Search.ivfCell(col("embedding"), centroids), out, bucketCol = "cell")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), Search.ivfCell(col("embedding"), centroids).as("cell"))
    val pruned = Search.readPruned(spark, out, q, bucketCol = "cell")
      .select(col("vec_id"), round(Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(5)
    val scan = indexScan(pruned)
    assert(scan.partitionFilters.nonEmpty)
    assert(pruned.count() == 5)
  }
}

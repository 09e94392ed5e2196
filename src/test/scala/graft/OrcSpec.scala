package graft

import org.apache.spark.sql.functions._

/** ORC source/sink: the scan must receive BOTH partition filters (so a
  * partitioned lake layout prunes directories, never lists them) and
  * pushed data filters — the two properties that make a columnar source
  * usable at 100 TB. Values round-trip exactly, including newlines and
  * non-ASCII. */
class OrcSpec extends SparkSpec {

  test("partition pruning and predicate pushdown reach the ORC scan; values round-trip") {
    val out = java.nio.file.Files.createTempDirectory("graft_orcspec").toString
    val src = spark.range(0, 100).select(col("id").as("doc_id"),
      (col("id") % 5).as("part"), (col("id") * 3).as("v"),
      concat(lit("s\nü-"), col("id").cast("string")).as("text"))
    src.coalesce(1).write.mode("overwrite").partitionBy("part").orc(out)
    val q = spark.read.orc(out).filter(col("part") === 2 && col("v") > 30)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part"), plan)
    assert(plan.contains("GreaterThan(v,30"), s"data filter must push into the scan: $plan")
    // id % 5 == 2 and 3*id > 30 → ids 12, 17, …, 97
    assert(q.count() == 18)
    val row = q.filter(col("doc_id") === 12).select("text").head().getString(0)
    assert(row == "s\nü-12")
  }

  test("the router detects real parquet and ORC payloads; torn tails fail health") {
    import graft.ops.Sniff
    def fileBytes(dir: String, suffix: String): Array[Byte] = {
      val f = new java.io.File(dir).listFiles().find(_.getName.endsWith(suffix)).get
      java.nio.file.Files.readAllBytes(f.toPath)
    }
    val base = java.nio.file.Files.createTempDirectory("graft_sniff_lake").toString
    val src = spark.range(0, 50).select(col("id"), (col("id") * 3).as("v"))
    src.coalesce(1).write.mode("overwrite").parquet(s"$base/p")
    src.coalesce(1).write.mode("overwrite").orc(s"$base/o")
    val pq = fileBytes(s"$base/p", ".parquet")
    val orc = fileBytes(s"$base/o", ".orc")
    assert(Sniff.detect(pq) == "parquet" && Sniff.healthy("parquet", pq))
    assert(Sniff.detect(orc) == "orc" && Sniff.healthy("orc", orc))
    // torn tail: head magic keeps detection, the footer check fails health;
    // a parquet with a LYING footer length does the same
    val tornPq = java.util.Arrays.copyOf(pq, pq.length - 3)
    assert(Sniff.detect(tornPq) == "parquet" && !Sniff.healthy("parquet", tornPq))
    val lying = pq.clone()
    lying(lying.length - 8) = 0xff.toByte // footer length > file size
    lying(lying.length - 7) = 0xff.toByte
    lying(lying.length - 6) = 0xff.toByte
    assert(Sniff.detect(lying) == "parquet" && !Sniff.healthy("parquet", lying))
    assert(Sniff.detect(java.util.Arrays.copyOf(orc, orc.length - 2)) == "unknown")
    // text starting with the ORC magic must stay unknown (head-only
    // detection would misroute it)
    assert(Sniff.detect("ORCHESTRA programme notes, 1986".getBytes) == "unknown")
    // a tar whose first member is named "PAR1…" must stay tar (the
    // offset-257 magic discriminates before the parquet head check)
    val trap = graft.ops.Tar.encodeTar(Seq(("PAR1-data.txt", "hello".getBytes)))
    assert(Sniff.detect(trap) == "tar")
    // healthy is public API: null/short payloads must answer false, not throw
    for (fmt <- Seq("parquet", "orc", "arrow")) {
      assert(!Sniff.healthy(fmt, null), fmt)
      assert(!Sniff.healthy(fmt, Array[Byte](1, 2, 3)), fmt)
    }
  }
}

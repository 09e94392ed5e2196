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
}

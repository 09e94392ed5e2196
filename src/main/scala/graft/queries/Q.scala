package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: Spark implementation + DuckDB oracle SQL
  * (None → driver records a weaker rows-only check).
  *
  * Conventions for hash-parity with the DuckDB oracle:
  *  - every output column is explicitly aliased, same name in both;
  *  - every query ends with a deterministic total ORDER BY;
  *  - double aggregates are `round(_, 6)` in both engines; money sums go
  *    through decimal(18,2) casts (exact, order-independent) — source money
  *    columns hold 2-decimal values so the casts are lossless;
  *  - timestamps are emitted as `unix_micros` bigints or dates, never raw
  *    nanosecond timestamps (parquet ns vs Spark µs truncation).
  */
final case class Q(name: String, oracle: Option[String], fn: (SparkSession, String) => DataFrame)

trait QuerySet { def all: Seq[Q] }

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: Spark implementation + DuckDB oracle SQL
  * (None → driver records a weaker rows-only check).
  *
  * Conventions for hash-parity with the DuckDB oracle:
  *  - every output column is explicitly aliased, same name in both;
  *  - every query ends with a deterministic total ORDER BY;
  *  - NO DECIMAL or HUGEINT output columns, ever: the driver's hasher
  *    fetches the oracle through pandas, which coerces both to float64
  *    ("1.10" → 1.1, 5 → 5.0) while Spark's parquet keeps Decimal/int64 —
  *    bit-exact values still hash-mismatch. Money sums go through
  *    decimal(18,2) internally (exact, order-independent — source money
  *    columns hold 2-decimal values so the casts are lossless) but are
  *    EMITTED as integer cents/1e-4 units cast to BIGINT; DuckDB integer
  *    sums get CAST(... AS BIGINT) to undo HUGEINT promotion;
  *  - averages are exact-integer sums divided as doubles with the same
  *    expression tree in both engines — never `round(avg(x), n)`;
  *  - timestamps are emitted as `unix_micros` bigints or dates, never raw
  *    nanosecond timestamps (parquet ns vs Spark µs truncation).
  */
final case class Q(name: String, oracle: Option[String], fn: (SparkSession, String) => DataFrame)

trait QuerySet { def all: Seq[Q] }

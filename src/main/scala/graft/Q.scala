package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * parquet tables. Conventions that keep the driver's hash-compare
  * stable across engines:
  *   - every computed column aliased identically on both sides
  *   - integer aggregates cast to BIGINT in the oracle (DuckDB sums of
  *     INT are HUGEINT otherwise) — and this includes `sum() OVER`
  *     windows AND any arithmetic derived from them (`//`, `%` stay
  *     HUGEINT once promoted): wrap the final derived column in
  *     CAST(... AS BIGINT)
  *   - doubles rounded to a fixed scale on both sides
  *   - timestamps emitted as formatted strings (ns-vs-us parquet
  *     precision would otherwise differ)
  *   - deterministic ORDER BY on output keys
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

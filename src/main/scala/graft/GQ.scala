package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark program plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  * Column names of `run`'s output and the oracle's SELECT list must match
  * exactly (driver hash-compares after sorting columns by name).
  * Queries with no SQL equivalent (iterative graph algorithms, LSH
  * bucketing, ...) omit the oracle and get a rows-only check.
  */
final case class GQ(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

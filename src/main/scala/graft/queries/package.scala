package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver contract: (session, sf-dir) → result. */
  type Q = (SparkSession, String) => DataFrame

  /** One operator entry: name, Spark impl, optional DuckDB oracle SQL.
    * Oracle-less entries get the driver's weaker rows-only check
    * (non-SQL-expressible ops: LSH, simhash, multimodal stubs). */
  final case class Entry(name: String, q: Q, oracle: Option[String])

  def entry(name: String, oracle: String)(q: Q): Entry = Entry(name, q, Some(oracle))
  def entryNoOracle(name: String)(q: Q): Entry = Entry(name, q, None)
}

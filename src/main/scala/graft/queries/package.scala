package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.row_number

package object queries {
  /** Driver contract: (session, sf-dir) → result. */
  type Q = (SparkSession, String) => DataFrame

  /** One operator entry: name, Spark impl, optional DuckDB oracle SQL.
    * Oracle-less entries get the driver's weaker rows-only check
    * (non-SQL-expressible ops: LSH, simhash, multimodal stubs). */
  final case class Entry(name: String, q: Q, oracle: Option[String])

  def entry(name: String, oracle: String)(q: Q): Entry = Entry(name, q, Some(oracle))
  def entryNoOracle(name: String)(q: Q): Entry = Entry(name, q, None)

  /** Deterministic ranked top-k: distributed sort+limit first
    * (TakeOrderedAndProject — per-partition heads merged on the driver,
    * never a global single-partition sort), then the rank window runs
    * over only the k survivors. `order` must be a total order (include a
    * tie-break column). */
  def topKRanked(df: DataFrame, k: Int, rankCol: String, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol, row_number().over(Window.orderBy(order: _*)))
}

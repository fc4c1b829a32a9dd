package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StringType}

/** JSON payload decoding with sampled schema inference.
  *
  * Mirrors the reference's one-shot per-topic format detection
  * (`app/redpanda_to_parquet_collector.py:172-220`) rather than per-row
  * try/except: we pay a bounded `limit(sampleSize)` scan once to learn the
  * payload schema, then decode the full stream with the codegen'd
  * `from_json` — on a 100 TB input the sampling job touches a handful of
  * row groups, while the decode itself is a narrow map with no shuffle.
  *
  * Undecodable rows degrade to NULL struct + the raw string retained in a
  * `raw_value` column, mirroring `:240-241, 256, 400-402`.
  */
object JsonDecode {

  /** Infer the payload schema from a bounded sample of non-null values. */
  def inferSchema(spark: SparkSession, df: DataFrame, column: String,
                  sampleSize: Int = 1000): StructType = {
    val sample = df.select(col(column).cast(StringType)).na.drop
      .limit(sampleSize).as[String](Encoders.STRING)
    spark.read.json(sample).schema
  }

  /** Decode `column` (JSON string) into a struct column named `as`,
    * with raw_value fallback for rows that fail to parse.
    *
    * Malformed-row detection goes through an explicit corrupt-record
    * field: in PERMISSIVE mode `from_json` returns a NON-NULL struct of
    * nulls for unparseable input (its FailureSafeParser maps the error,
    * it never nulls the struct), so a `col(as).isNull` test can never
    * fire and the degrade-to-raw_value contract (collector `:240-241`)
    * would silently lose the payload. With `columnNameOfCorruptRecord`
    * in the parse schema the raw text lands in that field exactly when
    * parsing failed; we hoist it to `raw_value`, null out the struct,
    * and drop the marker field from the decoded shape. */
  def decode(spark: SparkSession, df: DataFrame, column: String,
             as: String = "data", sampleSize: Int = 1000): DataFrame = {
    val corrupt = "_graft_corrupt"
    // spark.read.json itself adds a "_corrupt_record" field when the
    // INFERENCE sample contains malformed rows — strip it, or the decoded
    // struct would carry a duplicate of our marker as a payload field
    val schema = StructType(inferSchema(spark, df, column, sampleSize)
      .fields.filterNot(_.name == "_corrupt_record"))
    require(!schema.fieldNames.contains(corrupt),
      s"payload schema collides with the internal corrupt-record field $corrupt")
    val parseSchema = schema.add(corrupt, StringType)
    df.withColumn(as, from_json(col(column).cast(StringType), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)))
      .withColumn("raw_value", col(s"$as.$corrupt"))
      .withColumn(as,
        when(col("raw_value").isNotNull, lit(null)).otherwise(col(as).dropFields(corrupt)))
  }

  /** decode + flatten in one step: the collector's per-record pipeline
    * (decode_message → flatten_dict, `:385-399`). */
  def decodeFlat(spark: SparkSession, df: DataFrame, column: String,
                 sampleSize: Int = 1000): DataFrame =
    Flatten.flatten(decode(spark, df, column, sampleSize = sampleSize).drop(column))
}

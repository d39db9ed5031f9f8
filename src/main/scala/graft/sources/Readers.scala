package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input loading with extension-based format inference
  * (reference: datacompy/cli/backends.py:56-105, 290-305). */
object Readers {
  private val extensionFormats = Map(
    ".csv" -> "csv",
    ".parquet" -> "parquet",
    ".pq" -> "parquet",
    ".json" -> "json",
    ".jsonl" -> "json",
    ".ndjson" -> "json")
  private val ndjsonExtensions = Set(".jsonl", ".ndjson")

  private def extension(ref: String): String = {
    val name = new java.io.File(ref).getName
    val dot = name.lastIndexOf('.')
    if (dot < 0) "" else name.substring(dot).toLowerCase
  }

  /** `.tsv` is deliberately unmapped (reference: backends.py:71-100). */
  def inferFormat(ref: String, overrideFormat: Option[String]): String =
    overrideFormat.getOrElse {
      extensionFormats.getOrElse(extension(ref),
        throw new IllegalArgumentException(
          s"cannot infer the format of '$ref' from its extension " +
            s"'${if (extension(ref).isEmpty) "(none)" else extension(ref)}'. " +
            "Pass --input-format csv|parquet|json."))
    }

  def isNdjson(ref: String): Boolean = ndjsonExtensions.contains(extension(ref))

  /** Load a dataset (reference: backends.py:290-305). */
  def load(spark: SparkSession, ref: String, format: String,
      csvDelimiter: String = ","): DataFrame = format match {
    case "csv" =>
      spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .option("sep", csvDelimiter)
        .csv(ref)
    case "parquet" => spark.read.parquet(ref)
    case "json" =>
      spark.read.option("multiLine", (!isNdjson(ref)).toString).json(ref)
    // catalog tables (reference's table source is Snowflake-only,
    // snowflake.py:199-233; here any 1-3 part catalog identifier works)
    case "table" =>
      require(tableRef.matches(ref), s"not a valid table reference: $ref")
      spark.table(ref)
    case other =>
      throw new IllegalArgumentException(s"unsupported input format: $other")
  }

  private val tableRef = "^[A-Za-z_$][\\w$]*(\\.[A-Za-z_$][\\w$]*){0,2}$".r

  /** Report label from a path stem (reference: cli/parser.py:233-245). */
  def defaultDatasetName(ref: String): String = {
    val name = new java.io.File(ref).getName
    val dot = name.lastIndexOf('.')
    if (dot <= 0) name else name.substring(0, dot)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink surface beyond parquet, mirroring the reference's ingest paths.
  *
  *  - CSV with custom separator/encoding (reference loads the KvK sample with
  *    sep=';' — /root/reference/emm/data/create_data.py:91-96,127)
  *  - binary files (the reference reads pickled model bytes through
  *    sparkContext.binaryFiles — emm/helper/io.py:39-42); Spark's binaryFile
  *    source is the native equivalent
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, sep: String = ";",
              header: Boolean = true, encoding: String = "UTF-8"): DataFrame =
    spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("encoding", encoding)
      .option("inferSchema", "true")
      .csv(path)

  /** (path, modificationTime, length, content) rows. */
  def readBinaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  def writeCsv(df: DataFrame, path: String, sep: String = ";"): Unit =
    df.write.mode("overwrite").option("sep", sep).option("header", "true").csv(path)
}

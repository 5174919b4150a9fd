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

  /** JSON-Lines — the de-facto interchange format for LLM training corpora.
    * Spark's json source IS jsonl (one object per line, splittable, so a
    * 100 TB corpus still parallelizes by line blocks). Reading takes an
    * explicit schema: schema inference is a full extra pass over the data
    * and silently widens types, neither acceptable at scale.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Hive-style partitioned parquet sink: one directory per `partCols` value.
    * Reading back with a filter on a partition column prunes at PLANNING
    * time (PartitionFilters in the scan, untouched directories never listed)
    * — the layout a corpus store needs so per-language / per-source jobs
    * read only their slice.
    */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Bucketed parquet table (external, at `path`): rows are hash-assigned to
    * `nBuckets` files per partition on `bucketCol` and sorted within each
    * bucket, with the layout recorded in the catalog. Two tables bucketed
    * the same way JOIN WITHOUT ANY EXCHANGE — the co-located-join layout for
    * fact tables that are joined on the same key repeatedly (each side's
    * shuffle is paid ONCE at write time instead of per query); asserted on
    * the physical plan in PlanShapeSpec. Bucketing needs the catalog, hence
    * saveAsTable; the table is external so data lives at `path`, and any
    * previous registration is replaced.
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
                         nBuckets: Int, path: String): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }
}

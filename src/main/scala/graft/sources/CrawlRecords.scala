package graft.sources

import java.io.{BufferedInputStream, EOFException, FileInputStream}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap, Set => JSet}

import scala.collection.JavaConverters._
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** WARC-style crawl-record files as a native DataSource V2 connector — the
  * record-framed binary interchange a crawler emits (the WARC/1.0 idea:
  * a header block framing a length-delimited payload, ISO 28500), reduced
  * to a declared house format `WREC/1.0`:
  *
  * {{{
  *   WREC/1.0\r\n
  *   Record-Type: response\r\n          (required)
  *   Target-URI: https://...\r\n        (required)
  *   Content-Digest: xxh64:<16 hex>\r\n (optional)
  *   Content-Length: N\r\n              (required, payload bytes)
  *   \r\n
  *   <exactly N payload bytes>\r\n
  * }}}
  *
  * Records concatenate back to back; bare `\r`/`\n` separator bytes
  * between records are skipped (so a line-oriented writer that appends a
  * newline per record round-trips byte-exactly). Payload bytes are opaque
  * — embedded newlines, CRLFs, even a byte sequence that LOOKS like a
  * record header never confuse the parser, because payloads are length-
  * framed, never scanned.
  *
  * Schema: `(url, record_type, content_length, headers, payload, valid,
  * error)`. `headers` is the raw header-line array in record order
  * (header names can repeat in crawl records; a map would silently drop
  * duplicates and order). `valid`/`error` are the
  * [[graft.multimodal.BinaryMedia]] strict-decode discipline applied at
  * the source: a corrupt record becomes a VERDICT ROW, never an exception
  * that kills the 100 TB job's task —
  *  - record-grain failures (missing required header, malformed header
  *    line, unparseable Content-Length with a recoverable frame, digest
  *    mismatch against the declared xxh64) quarantine THAT record and the
  *    scan continues;
  *  - frame-grain failures (bad magic, truncated payload) emit one error
  *    row and end the file, because the record boundary itself is lost.
  *
  * The two planner contracts that matter at scale are wired for real:
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): payload
  *    bytes are `skip()`ed — never read, never allocated — unless the
  *    projection needs `payload` or a digest verdict (`valid`/`error`);
  *    a headers-only scan over TB of records runs at header speed;
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): `EqualTo` /
  *    `IsNotNull` on `url`/`record_type` evaluate right after the header
  *    block, BEFORE the payload is touched, so a response-only scan skips
  *    every request payload and filtered records never cross the source
  *    boundary. Anything else is returned to Spark, never dropped.
  *
  * One [[InputPartition]] per file — exactly how crawl archives shard at
  * scale (the crawler controls file size; records never split across
  * files). Local-filesystem paths (the test substrate); the reader is a
  * plain InputStream walk, transport-agnostic.
  */
class CrawlRecordDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CrawlRecords.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new CrawlRecordTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object CrawlRecords {
  val Magic = "WREC/1.0"

  val schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("record_type", StringType),
    StructField("content_length", LongType),
    StructField("headers", ArrayType(StringType)),
    StructField("payload", BinaryType),
    StructField("valid", BooleanType, nullable = false),
    StructField("error", StringType)))

  /** What the SINK accepts: framing fields are derived, not provided. */
  val writeSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("record_type", StringType),
    StructField("payload", BinaryType)))

  /** xxhash64 with Spark SQL's seed — the digest the `xxhash64()` function
    * computes, so fixtures can declare digests relationally. */
  def xxh64(bytes: Array[Byte]): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L)
}

private[sources] class CrawlRecordTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"crawl_records($path)"
  override def schema(): StructType = CrawlRecords.schema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CrawlRecordScanBuilder(path)
}

/** The WRITE side of the WREC format — the sink a crawler's fetch stage
  * appends archives through. A dedicated provider (not a capability on
  * the read table) because the write SURFACE is narrower than the read
  * schema: callers provide `(url, record_type, payload)` and the sink
  * derives the framing — `Content-Length` from the payload bytes and
  * `Content-Digest` as the Spark-seed xxh64 — so every archive it writes
  * is self-verifying through [[CrawlRecordDataSource]]'s digest check.
  *
  * One file per input partition (`part-<partition>-<task>.wrec`), exactly
  * the sharding the read side parallelizes over; task retries write to a
  * distinct task-id name and abort deletes the orphan. Job commit is a
  * no-op — files land complete or are deleted, the same non-atomic
  * visibility contract as the parquet ledgers (documented, not hidden).
  */
class CrawlRecordSinkDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CrawlRecords.writeSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new CrawlRecordSinkTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class CrawlRecordSinkTable(path: String)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.write._

  override def name(): String = s"crawl_records_sink($path)"
  override def schema(): StructType = CrawlRecords.writeSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              info: PhysicalWriteInfo): DataWriterFactory = {
            java.nio.file.Files.createDirectories(
              java.nio.file.Paths.get(path))
            new CrawlRecordWriterFactory(path)
          }
          override def commit(
              messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(
              messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

private[sources] class CrawlRecordWriterFactory(path: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new CrawlRecordWriter(path, partitionId, taskId)
}

private[sources] case object CrawlRecordsWritten
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** Per-partition record writer: streams records out in row order, file
  * opened lazily so empty partitions leave no file behind. Row layout is
  * [[CrawlRecords.writeSchema]]: (url, record_type, payload). */
private[sources] class CrawlRecordWriter(path: String, partitionId: Int,
                                         taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val file = new java.io.File(path, f"part-$partitionId%05d-$taskId.wrec")
  private var out: java.io.BufferedOutputStream = _

  override def write(row: InternalRow): Unit = {
    if (out == null)
      out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(file), 1 << 16)
    val url = if (row.isNullAt(0)) null else row.getUTF8String(0).toString
    val tpe = if (row.isNullAt(1)) null else row.getUTF8String(1).toString
    require(url != null && tpe != null,
      "crawl-record sink: url and record_type must be non-null")
    val payload = if (row.isNullAt(2)) Array.empty[Byte] else row.getBinary(2)
    val head = new StringBuilder(CrawlRecords.Magic).append("\r\n")
      .append("Record-Type: ").append(tpe).append("\r\n")
      .append("Target-URI: ").append(url).append("\r\n")
      .append(f"Content-Digest: xxh64:${CrawlRecords.xxh64(payload)}%016x\r\n")
      .append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    out.write(head.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.write(payload)
    out.write('\r'.toInt); out.write('\n'.toInt)
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (out != null) out.close()
    CrawlRecordsWritten
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    file.delete()
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}

private[sources] class CrawlRecordScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = CrawlRecords.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val pushable = Set("url", "record_type")
    val (ours, rest) = filters.partition {
      case EqualTo(a, _) if pushable.contains(a) => true
      case IsNotNull(a) if pushable.contains(a)  => true
      case _                                     => false
    }
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new CrawlRecordScan(path, required, pushed)
}

private[sources] class CrawlRecordScan(path: String,
                                       val required: StructType,
                                       val pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"CrawlRecordScan path=$path, " +
      s"ReadSchema=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters=[${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory)
        dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith("."))
      else Array(dir)
    files.sortBy(_.getName)
      .map(f => CrawlRecordPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CrawlRecordReaderFactory(required, pushed)
}

private[sources] case class CrawlRecordPartition(file: String)
    extends InputPartition

private[sources] class CrawlRecordReaderFactory(required: StructType,
                                                pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CrawlRecordReader(required, pushed,
      p.asInstanceOf[CrawlRecordPartition].file)
}

/** Streaming per-file reader: one record in flight at a time, payloads
  * skipped whenever the projection and the digest verdict allow.
  */
private[sources] class CrawlRecordReader(required: StructType,
                                         pushed: Array[Filter],
                                         file: String)
    extends PartitionReader[InternalRow] {

  private val in = new BufferedInputStream(new FileInputStream(file), 1 << 16)
  private val outCols = required.fieldNames.toSeq
  // the payload must be READ (not skipped) iff the projection carries the
  // bytes themselves or a digest verdict computed from them
  private val needPayload =
    Seq("payload", "valid", "error").exists(outCols.contains)
  private var row: InternalRow = _
  private var halted = false

  private def evalPushed(url: String, tpe: String): Boolean =
    pushed.forall {
      case EqualTo("url", v)          => url != null && url == v
      case EqualTo("record_type", v)  => tpe != null && tpe == v
      case IsNotNull("url")           => url != null
      case IsNotNull("record_type")   => tpe != null
      case _                          => true
    }

  /** One header/magic line, bytes to '\n', trailing CR stripped; null at
    * EOF before any byte. */
  private def readLine(): String = {
    val buf = new ArrayBuffer[Byte](64)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf += b.toByte; b = in.read() }
    val n = if (buf.nonEmpty && buf.last == '\r') buf.length - 1 else buf.length
    new String(buf.toArray, 0, n, StandardCharsets.UTF_8)
  }

  /** Skip bare separator bytes between records; false at EOF. */
  private def skipSeparators(): Boolean = {
    in.mark(1)
    var b = in.read()
    while (b == '\n' || b == '\r') { in.mark(1); b = in.read() }
    if (b < 0) false else { in.reset(); true }
  }

  private def emit(url: String, tpe: String, len: java.lang.Long,
                   headers: Seq[String], payload: Array[Byte],
                   error: String): InternalRow =
    InternalRow.fromSeq(outCols.map {
      case "url"            => if (url == null) null else UTF8String.fromString(url)
      case "record_type"    => if (tpe == null) null else UTF8String.fromString(tpe)
      case "content_length" => len
      case "headers"        =>
        if (headers == null) null
        else ArrayData.toArrayData(
          headers.map(UTF8String.fromString).toArray[Any])
      case "payload"        => payload
      case "valid"          => java.lang.Boolean.valueOf(error == null)
      case "error"          => if (error == null) null else UTF8String.fromString(error)
    })

  /** Frame-grain failure: the record boundary is lost — stop the file.
    * The verdict row still honors the pushed predicates (the scan's
    * output contract); a filtered scan that skips it is by design — the
    * quarantine pass runs unfiltered. */
  private def haltWith(url: String, tpe: String, len: java.lang.Long,
                       headers: Seq[String], payload: Array[Byte],
                       error: String): Boolean = {
    halted = true
    if (evalPushed(url, tpe)) {
      row = emit(url, tpe, len, headers, payload, error); true
    } else false
  }

  override def next(): Boolean = {
    if (halted) return false
    while (true) {
      if (!skipSeparators()) return false
      val magic = readLine()
      if (magic == null) return false
      if (magic != CrawlRecords.Magic)
        return haltWith(null, null, null, null, null, s"bad magic: $magic")
      // header block to the blank line
      val headers = ArrayBuffer.empty[String]
      var recordError: String = null // first failure wins
      var line = readLine()
      while (line != null && line.nonEmpty) {
        headers += line
        if (!line.contains(": ") && recordError == null)
          recordError = s"malformed header line: $line"
        line = readLine()
      }
      if (line == null)
        return haltWith(null, null, null, headers.toSeq, null,
          "truncated header block")
      def header(name: String): String = headers.collectFirst {
        case h if h.startsWith(name + ": ") => h.substring(name.length + 2)
      }.orNull
      val tpe = header("Record-Type")
      val url = header("Target-URI")
      val lenStr = header("Content-Length")
      val len: java.lang.Long =
        try { if (lenStr == null) null else java.lang.Long.valueOf(lenStr.trim) }
        catch { case _: NumberFormatException => null }
      if (len == null)
        // frame-grain: without a byte count the payload cannot be framed
        return haltWith(url, tpe, null, headers.toSeq, null,
          if (lenStr == null) "missing header: Content-Length"
          else s"bad Content-Length: $lenStr")
      if (len > Int.MaxValue)
        return haltWith(url, tpe, len, headers.toSeq, null,
          s"payload too large: $len bytes (2 GiB record ceiling)")
      if (recordError == null && tpe == null)
        recordError = "missing header: Record-Type"
      if (recordError == null && url == null)
        recordError = "missing header: Target-URI"

      if (!evalPushed(url, tpe)) {
        try in.skipNBytes(len) // filtered out — payload never read
        catch { case _: EOFException =>
          return haltWith(url, tpe, len, headers.toSeq, null,
            "truncated payload")
        }
      } else if (!needPayload) {
        try in.skipNBytes(len) // pruned out — payload never read
        catch { case _: EOFException =>
          return haltWith(url, tpe, len, headers.toSeq, null,
            "truncated payload")
        }
        row = emit(url, tpe, len, headers.toSeq, null, recordError)
        return true
      } else {
        val payload = in.readNBytes(len.toInt)
        if (payload.length < len) {
          halted = true
          row = emit(url, tpe, len, headers.toSeq, payload,
            s"truncated payload: ${payload.length} of $len bytes")
          return true
        }
        val digest = header("Content-Digest")
        if (recordError == null && digest != null) {
          if (!digest.startsWith("xxh64:") || digest.length != 22)
            recordError = s"bad Content-Digest: $digest"
          else {
            val declared =
              try java.lang.Long.parseUnsignedLong(digest.substring(6), 16)
              catch { case _: NumberFormatException => 0L }
            val actual = CrawlRecords.xxh64(payload)
            if (declared != actual)
              recordError = f"digest mismatch: declared ${digest.substring(6)}%s" +
                f" actual $actual%016x"
          }
        }
        row = emit(url, tpe, len, headers.toSeq, payload, recordError)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

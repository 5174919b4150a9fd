package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.CrawlRecords

/** Reader-level units for the WARC-style crawl-record DSv2 connector:
  * length-framing (payload bytes are never scanned), the skip-vs-read
  * pruning contract, record-grain quarantine vs frame-grain halt, and
  * filter pushdown at the record boundary.
  */
class CrawlRecordsSpec extends SparkSpec {
  import spark.implicits._

  private def record(tpe: String, uri: String, payload: Array[Byte],
                     digest: Option[Long] = None,
                     declaredLen: Option[Long] = None): Array[Byte] = {
    val sb = new StringBuilder("WREC/1.0\r\n")
    if (tpe != null) sb.append(s"Record-Type: $tpe\r\n")
    if (uri != null) sb.append(s"Target-URI: $uri\r\n")
    digest.foreach(d => sb.append(f"Content-Digest: xxh64:$d%016x\r\n"))
    sb.append(s"Content-Length: ${declaredLen.getOrElse(payload.length.toLong)}\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    head ++ payload ++ "\r\n".getBytes(StandardCharsets.UTF_8)
  }

  private def writeFile(dir: Path, name: String, recs: Array[Byte]*): Unit =
    Files.write(dir.resolve(name), recs.flatten.toArray)

  private def read(dir: Path): DataFrame =
    spark.read.format("graft.sources.CrawlRecordDataSource")
      .load(dir.toString)

  private def tmpDir(): Path =
    Files.createTempDirectory("graft_t_crawlrec_")

  test("round-trip: headers, digest-verified payload with embedded CRLFs " +
      "AND an embedded fake record — length framing never scans payload") {
    val dir = tmpDir()
    // the payload CONTAINS a byte-perfect record: a delimiter-scanning
    // parser would "find" it; a length-framed one must not
    val trap = record("response", "https://t/inner", "inner".getBytes)
    val payload = "line1\r\nline2\n".getBytes(StandardCharsets.UTF_8) ++ trap
    writeFile(dir, "a.wrec",
      record("response", "https://t/1", payload,
        digest = Some(CrawlRecords.xxh64(payload))),
      record("request", "https://t/1", Array.empty))
    val rows = read(dir).orderBy("record_type").collect()
    assert(rows.length == 2, "exactly the two framed records, no trap row")
    val req = rows(0)
    assert(req.getAs[String]("record_type") == "request")
    assert(req.getAs[Long]("content_length") == 0L)
    assert(req.getAs[Boolean]("valid"))
    val resp = rows(1)
    assert(resp.getAs[String]("url") == "https://t/1")
    assert(resp.getAs[scala.collection.Seq[String]]("headers").size == 4)
    assert(resp.getAs[Array[Byte]]("payload").sameElements(payload))
    assert(resp.getAs[Boolean]("valid") && resp.getAs[String]("error") == null)
    graft.operators.FsUtil.deleteRecursively(dir.toFile)
  }

  test("pruned projection skips payload bytes entirely and still frames " +
      "every record (headers-only scan at header speed)") {
    val dir = tmpDir()
    val trap = record("response", "https://t/inner", "x".getBytes)
    writeFile(dir, "a.wrec",
      record("response", "https://t/1", trap),
      record("response", "https://t/2", "abc".getBytes))
    val out = read(dir).select("url", "content_length")
      .orderBy("url").collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("https://t/1", "https://t/2"))
    assert(out(0).getLong(1) == trap.length.toLong)
    graft.operators.FsUtil.deleteRecursively(dir.toFile)
  }

  test("record-grain quarantine: a digest mismatch and a missing " +
      "Target-URI become verdict rows and the scan CONTINUES") {
    val dir = tmpDir()
    writeFile(dir, "a.wrec",
      record("response", "https://t/1", "good".getBytes,
        digest = Some(CrawlRecords.xxh64("good".getBytes))),
      record("response", "https://t/2", "bad".getBytes,
        digest = Some(CrawlRecords.xxh64("other".getBytes))),
      record("response", null, "nouri".getBytes),
      record("response", "https://t/4", "tail".getBytes))
    val rows = read(dir).collect()
    assert(rows.length == 4, "quarantine must not stop the scan")
    val byUrl = rows.map(r => Option(r.getAs[String]("url")) -> r).toMap
    assert(byUrl(Some("https://t/1")).getAs[Boolean]("valid"))
    assert(byUrl(Some("https://t/2")).getAs[String]("error")
      .startsWith("digest mismatch"))
    assert(byUrl(None).getAs[String]("error") ==
      "missing header: Target-URI")
    assert(byUrl(Some("https://t/4")).getAs[Boolean]("valid"),
      "the record after a quarantined one must still parse")
    graft.operators.FsUtil.deleteRecursively(dir.toFile)
  }

  test("frame-grain halt: truncated payload and bad magic emit ONE error " +
      "row each and end the file; earlier records survive") {
    val truncDir = tmpDir()
    val full = record("response", "https://t/1", "complete".getBytes)
    val cut = record("response", "https://t/2", "willbecut".getBytes)
      .dropRight(6) // lose payload tail + terminator
    writeFile(truncDir, "a.wrec", full, cut)
    val rows = read(truncDir).orderBy("url").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Boolean]("valid"))
    assert(rows(1).getAs[String]("error").startsWith("truncated payload"))

    val magicDir = tmpDir()
    writeFile(magicDir, "a.wrec", full,
      "GARBAGE\r\nmore\r\n".getBytes(StandardCharsets.UTF_8),
      record("response", "https://t/3", "never".getBytes))
    val mrows = read(magicDir).collect()
    assert(mrows.length == 2, "nothing after a lost frame may be emitted")
    assert(mrows.exists(r => Option(r.getAs[String]("error"))
      .exists(_.startsWith("bad magic"))))

    val lenDir = tmpDir()
    val noLen = ("WREC/1.0\r\nRecord-Type: response\r\n" +
      "Target-URI: https://t/9\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    writeFile(lenDir, "a.wrec", noLen)
    val lrows = read(lenDir).collect()
    assert(lrows.length == 1 && lrows(0).getAs[String]("error") ==
      "missing header: Content-Length")
    Seq(truncDir, magicDir, lenDir)
      .foreach(d => graft.operators.FsUtil.deleteRecursively(d.toFile))
  }

  test("pushed EqualTo on record_type drops filtered records at the " +
      "reader — and their payloads are skipped, not parsed") {
    val dir = tmpDir()
    writeFile(dir, "a.wrec",
      record("request", "https://t/1",
        record("response", "https://t/fake", "x".getBytes)),
      record("response", "https://t/1", "real".getBytes))
    val out = read(dir).filter(col("record_type") === "response").collect()
    assert(out.length == 1 && out(0).getAs[String]("url") == "https://t/1")
    graft.operators.FsUtil.deleteRecursively(dir.toFile)
  }

  test("sink round-trip: the writer derives length + digest, the source " +
      "verifies them; empty partitions leave no file") {
    val dir = tmpDir()
    val df = Seq(
      ("https://t/1", "response", "payload with\r\nembedded CRLF"),
      ("https://t/2", "request", ""),
      ("https://t/3", "response", "plain"))
      .toDF("url", "record_type", "payload_s")
      .select(col("url"), col("record_type"),
        col("payload_s").cast("binary").as("payload"))
      .repartition(8)
    df.write.format("graft.sources.CrawlRecordSinkDataSource")
      .mode("append").save(dir.toString)
    val files = dir.toFile.listFiles().filter(_.getName.endsWith(".wrec"))
    assert(files.nonEmpty && files.length <= 3,
      s"empty partitions must not leave files: ${files.length} of 8")
    val back = read(dir).collect()
    assert(back.length == 3)
    assert(back.forall(_.getAs[Boolean]("valid")),
      "every sink-written digest must verify through the source")
    val byUrl = back.map(r => r.getAs[String]("url") -> r).toMap
    assert(new String(byUrl("https://t/1").getAs[Array[Byte]]("payload"),
      StandardCharsets.UTF_8) == "payload with\r\nembedded CRLF")
    assert(byUrl("https://t/2").getAs[Long]("content_length") == 0L)
    // the digest header the sink wrote matches spark's own xxhash64
    val raw = new String(Files.readAllBytes(files.minBy(_.getName).toPath),
      StandardCharsets.UTF_8)
    assert(raw.contains("Content-Digest: xxh64:"),
      "sink records must carry a digest header")
    graft.operators.FsUtil.deleteRecursively(dir.toFile)
  }

  test("sink rejects a NULL url loudly instead of framing a broken record") {
    val dir = tmpDir()
    val df = Seq((Option.empty[String], "response", "x"))
      .toDF("url", "record_type", "payload_s")
      .select(col("url"), col("record_type"),
        col("payload_s").cast("binary").as("payload"))
    val e = intercept[Exception] {
      df.write.format("graft.sources.CrawlRecordSinkDataSource")
        .mode("append").save(dir.toString)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("must be non-null")), s"got $e")
    graft.operators.FsUtil.deleteRecursively(dir.toFile)
  }

  test("multi-file directory: one partition per file, all records read") {
    val dir = tmpDir()
    writeFile(dir, "a.wrec", record("response", "https://t/a", "a".getBytes))
    writeFile(dir, "b.wrec", record("response", "https://t/b", "b".getBytes))
    assert(read(dir).count() == 2)
    assert(read(dir).rdd.getNumPartitions == 2)
    graft.operators.FsUtil.deleteRecursively(dir.toFile)
  }
}

package graft.io

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int) = (0 until n).map { i =>
    val text = s"document $i body " + ("lorem ipsum dolor sit amet " * (1 + i % 40)) + s"tail $i"
    (s"http://example.com/doc/$i", text)
  }.toDF("target_uri", "payload")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("write/read roundtrip: per-member warc.gz, byte-exact payloads") {
    val dir = tmp("warcrt_") + "/corpus.warc.gz.d"
    val in = docs(200)
    WarcIO.write(in.repartition(4), dir)
    val got = WarcIO.read(spark, dir)
    assert(got.count() == 200)
    val pairs = got.select(col("target_uri"),
        col("payload").cast("string").as("text"), col("warc_type"),
        col("content_length"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    in.collect().foreach { r =>
      val (text, wtype, clen) = pairs(r.getString(0))
      assert(text == r.getString(1), s"payload drift for ${r.getString(0)}")
      assert(wtype == "conversion")
      assert(clen == r.getString(1).getBytes("UTF-8").length.toLong)
    }
    // record ids are deterministic urn:uuids — a rewrite is byte-stable
    val ids = got.select(col("record_id")).collect().map(_.getString(0))
    assert(ids.forall(_.startsWith("<urn:uuid:")) && ids.distinct.length == 200)
  }

  test("range-split gz read: every split boundary position yields the " +
      "same record set as a whole-file read") {
    val dir = tmp("warcsplit_") + "/c.warc.gz.d"
    WarcIO.write(docs(300).coalesce(1), dir) // ONE part file, 300 members
    val whole = WarcIO.read(spark, dir, splitBytes = 1L << 30)
      .select("target_uri").as[String].collect().sorted
    val split = WarcIO.read(spark, dir, splitBytes = 1L << 20)
      .select("target_uri").as[String].collect().sorted
    assert(whole.length == 300)
    assert(split.toSeq == whole.toSeq,
      "tasks scanning their own ranges must partition the member set exactly")
  }

  test("uncompressed .warc: driver header-walk framing + exact ranges") {
    val base = tmp("warcplain_")
    val f = new java.io.File(base, "corpus.warc")
    val out = new java.io.FileOutputStream(f)
    val rows = docs(50).collect()
    rows.foreach { r =>
      val payload = r.getString(1).getBytes("UTF-8")
      out.write((s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Record-ID: <urn:x:${r.getString(0)}>\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        s"WARC-Target-URI: ${r.getString(0)}\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1"))
      out.write(payload)
      out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    out.close()
    val got = WarcIO.read(spark, f.toString, splitBytes = 1L << 20)
    assert(got.count() == 50)
    val one = got.filter(col("target_uri") === "http://example.com/doc/7")
      .select(col("payload").cast("string")).as[String].head
    assert(one == rows(7).getString(1))
  }

  test("whole-file gzip (single member, non-CC layout) still reads — " +
      "degraded to sequential within the file") {
    val base = tmp("warcwhole_")
    val f = new java.io.File(base, "one.wet.gz")
    val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
    docs(20).collect().foreach { r =>
      val payload = r.getString(1).getBytes("UTF-8")
      out.write((s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        s"WARC-Target-URI: ${r.getString(0)}\r\n\r\n").getBytes("ISO-8859-1"))
      out.write(payload)
      out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    out.close()
    val got = WarcIO.read(spark, f.toString, splitBytes = 1L << 20)
    assert(got.count() == 20)
  }

  test("read_file dispatches .warc.gz / .wet / directories of them") {
    val dir = tmp("warcdisp_") + "/crawl.d"
    WarcIO.write(docs(25), dir)
    val g = graft.api.GeoDataFrame.readFile(spark, dir)
    assert(g.df.columns.contains("payload") && g.df.count() == 25)
  }

  test("truncated member fails loudly, never silently drops the tail") {
    val dir = tmp("warctrunc_") + "/c.warc.gz.d"
    WarcIO.write(docs(30).coalesce(1), dir)
    val part = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    java.nio.file.Files.write(part.toPath, bytes.dropRight(40)) // cut mid-member
    // drop Hadoop's LocalFS checksum sidecar — the test must reach OUR
    // truncation error, not a stale-crc ChecksumException
    new java.io.File(part.getParentFile, s".${part.getName}.crc").delete()
    val ex = intercept[org.apache.spark.SparkException] {
      WarcIO.read(spark, dir).count()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("truncated"), s"want a loud truncation error, got: $msg")
  }

  test("malformed record (missing Content-Length) fails loudly") {
    val base = tmp("warcbad_")
    val f = new java.io.File(base, "bad.warc")
    java.nio.file.Files.write(f.toPath,
      "WARC/1.0\r\nWARC-Type: metadata\r\n\r\noops\r\n\r\n".getBytes("ISO-8859-1"))
    val ex = intercept[Exception] { WarcIO.read(spark, f.toString).count() }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("Content-Length"))
  }
}

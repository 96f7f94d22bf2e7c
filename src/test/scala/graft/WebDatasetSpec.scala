package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.ext.WebDataset

/** WebDataset tar shards: ustar framing round-trip, null-field
  * skipping, sample grouping, truncation tolerance, and external
  * interchange (a real `tar` binary reads our shards). */
class WebDatasetSpec extends SparkTestBase {
  import spark.implicits._

  test("writeShards -> readEntries round-trips; null fields skipped; samples() groups per key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wds").toString
    val df = Seq(
      ("a0", "alpha text", "{\"k\":0}"),
      ("a1", "beta — utf8 café", null: String), // no json entry
      ("a2", "", "{\"k\":2}")) // empty payload is a real 0-byte entry
      .toDF("key", "txt", "json")
    WebDataset.writeShards(df.repartition(2), "key",
      Seq("txt" -> col("txt"), "json" -> col("json")), dir)
    val entries = WebDataset.readEntries(spark, dir + "/*.tar")
    val got = entries.collect()
      .map(e => (e.key, e.ext, new String(e.payload, UTF_8))).toSet
    assert(got == Set(
      ("a0", "txt", "alpha text"), ("a0", "json", "{\"k\":0}"),
      ("a1", "txt", "beta — utf8 café"),
      ("a2", "txt", ""), ("a2", "json", "{\"k\":2}")))
    // per-sample grouping: one row per key, fields as a map
    val s = WebDataset.samples(entries).collect()
      .map(r => r.getString(0) ->
        r.getMap[String, Array[Byte]](1).view.mapValues(new String(_, UTF_8)).toMap)
      .toMap
    assert(s.keySet == Set("a0", "a1", "a2"))
    assert(s("a1") == Map("txt" -> "beta — utf8 café"))
    assert(s("a2")("txt") == "")
    // entries of one sample are CONSECUTIVE in the shard, declared order
    val inOrder = entries.collect().groupBy(_.shard).values.flatMap(_.toSeq)
    val a0 = inOrder.filter(_.key == "a0").map(_.ext).toSeq
    assert(a0 == Seq("txt", "json"))
  }

  test("interchange: the system tar lists and extracts our shards byte-faithfully") {
    val tarBin = Seq("/usr/bin/tar", "/bin/tar").find(p => new java.io.File(p).canExecute)
    assume(tarBin.isDefined, "no tar binary on this host")
    val dir = java.nio.file.Files.createTempDirectory("graft-wds2").toString
    WebDataset.writeShards(
      Seq(("k1", "payload one"), ("k2", "payload two")).toDF("key", "txt")
        .repartition(1),
      "key", Seq("txt" -> col("txt")), dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    def run(args: String*): (Int, String) = {
      val pb = new ProcessBuilder((tarBin.get +: args): _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), UTF_8)
      (p.waitFor(), out)
    }
    val (lc, listing) = run("-tf", shard.getAbsolutePath)
    assert(lc == 0, listing)
    assert(listing.split("\n").map(_.trim).filter(_.nonEmpty).sorted.toSeq ==
      Seq("k1.txt", "k2.txt"))
    val xd = java.nio.file.Files.createTempDirectory("graft-wds2x").toString
    val (xc, xout) = run("-xf", shard.getAbsolutePath, "-C", xd)
    assert(xc == 0, xout)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(xd, "k1.txt")), UTF_8) == "payload one")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(xd, "k2.txt")), UTF_8) == "payload two")
  }

  test("reader tolerance: truncated tail stops cleanly; foreign tar (dirs + long padding) parses the regular files") {
    // build a shard, truncate mid-entry: the parsed prefix survives
    val dir = java.nio.file.Files.createTempDirectory("graft-wds3").toString
    WebDataset.writeShards(
      (0 until 8).map(i => (s"k$i", "x" * (100 + i))).toDF("key", "txt")
        .repartition(1),
      "key", Seq("txt" -> col("txt")), dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 1536 - 100)
    val parsed = WebDataset.parseStream(
      new java.io.ByteArrayInputStream(cut)).toSeq
    assert(parsed.nonEmpty && parsed.size < 8)
    assert(parsed.forall { case (n, d) => n.startsWith("k") && d.nonEmpty })
  }
}

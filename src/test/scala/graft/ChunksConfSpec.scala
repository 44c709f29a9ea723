package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._

/** The `graft-chunks` source must resolve filesystems with the SESSION's
  * Hadoop configuration (core-site + `spark.hadoop.*` overrides — s3a
  * credentials, endpoints, custom schemes), both at plan time (listing) and
  * inside the executor-side reader (open/seek). The probe: a filesystem
  * scheme that EXISTS ONLY in the session conf — a source building
  * `new Configuration()` cannot resolve it at all. */
class ChunksConfSpec extends SparkSpec {
  import spark.implicits._

  test("graft-chunks resolves a scheme defined only in the session Hadoop conf") {
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_fs").toFile
    val f = new java.io.File(dir, "asset.bin")
    val bytes = ("probe payload " * 5).getBytes("UTF-8") // 70 bytes
    java.nio.file.Files.write(f.toPath, bytes)
    val key = "fs.graftprobe.impl"
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set(key, classOf[ProbeFileSystem].getName)
    try {
      // plan-time listing AND reader-side open both go through the probe
      // scheme; default-configuration lookups would throw
      // "No FileSystem for scheme: graftprobe" at plan time
      val out = spark.read.format("graft-chunks")
        .option("chunk_bytes", 16)
        .load(s"graftprobe:${dir.getAbsolutePath}")
        .agg(
          count(lit(1)).as("rows"),
          sum(octet_length($"chunk")).as("bytes"),
          first($"n_chunks").as("n_chunks"))
        .as[(Long, Long, Long)].head()
      assert(out == ((5L, 70L, 5L)),
        s"expected 5 chunks / 70 bytes through the probe scheme; got $out")
    } finally {
      hc.unset(key)
      f.delete(); dir.delete()
    }
  }
}

/** Local filesystem under a scheme (`graftprobe:`) that no core-site knows —
  * resolvable only when the session Hadoop conf reaches the reader. */
class ProbeFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftprobe"
  override def getUri: URI = URI.create("graftprobe:///")
}

package graft.export

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Multipart-shaped object copy: byte identity across part boundaries,
  * single-stream small path, staging cleanup on failure, source delete. */
class ObjectCopySpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def writeBytes(n: Int): (String, Array[Byte]) = {
    val dir = Files.createTempDirectory("graft_objcopy")
    val bytes = Array.tabulate(n)(i => ((i * 31 + 7) % 251).toByte)
    val p = dir.resolve("src.bin")
    Files.write(p, bytes)
    (p.toString, bytes)
  }

  test("multipart copy is byte-identical incl. ragged final part") {
    val (src, bytes) = writeBytes(1000003) // prime → ragged last chunk
    val dst = src + ".copy"
    val r = ObjectCopy.copy(conf, src, dst, chunkSize = 64 * 1024, maxConcurrency = 4)
    assert(r.bytes == 1000003L && r.parts == 16)
    val got = Files.readAllBytes(Paths.get(dst))
    assert(java.util.Arrays.equals(got, bytes))
    val exp = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    assert(r.md5Hex == exp)
  }

  test("small object takes the single-stream path; overwrite works") {
    val (src, bytes) = writeBytes(1024)
    val dst = src + ".copy"
    Files.write(Paths.get(dst), Array[Byte](1, 2, 3)) // pre-existing target
    val r = ObjectCopy.copy(conf, src, dst, chunkSize = 64 * 1024)
    assert(r.parts == 1 && r.bytes == 1024L)
    assert(java.util.Arrays.equals(Files.readAllBytes(Paths.get(dst)), bytes))
  }

  test("deleteSource removes the source only after success") {
    val (src, _) = writeBytes(4096)
    val dst = src + ".moved"
    ObjectCopy.copy(conf, src, dst, chunkSize = 1024, deleteSource = true)
    assert(!Files.exists(Paths.get(src)) && Files.exists(Paths.get(dst)))
  }

  test("failure aborts: no partial object, no staging litter") {
    val dir = Files.createTempDirectory("graft_objcopy_fail")
    val dst = dir.resolve("out.bin").toString
    intercept[Exception] {
      ObjectCopy.copy(conf, dir.resolve("missing.bin").toString, dst, maxAttempts = 1)
    }
    val left = Files.list(dir).toArray.map(_.toString)
    assert(left.isEmpty, s"staging litter: ${left.mkString(", ")}")
  }
}

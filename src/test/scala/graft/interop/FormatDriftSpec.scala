package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** FORMAT-VERSION DRIFT gates (r11 verdict next #6): a table declaring
  * a spec version or protocol feature this from-spec reader does not
  * implement must refuse AT THE DOOR — misreading a future layout
  * (new manifest fields, new action semantics) would be silently
  * wrong in ways no later check catches. These specs doctor committed
  * tables into the future and lock the refusals. */
class FormatDriftSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def rewrite(path: java.nio.file.Path, edit: String => String): Unit = {
    val text = new String(Files.readAllBytes(path), "UTF-8")
    Files.write(path, edit(text).getBytes("UTF-8"))
    // drop the local FS's stale sidecar checksum so the doctored bytes read
    Files.deleteIfExists(path.resolveSibling("." + path.getFileName + ".crc")): Unit
  }

  test("Iceberg: metadata declaring format-version 4 refuses loudly at the door") {
    import spark.implicits._
    val path = freshDir("drift_ice_v4")
    Iceberg.write(Seq((1L, "a")).toDF("k", "v"), path)
    val metaPath = Paths.get(path, "metadata", "v00001.metadata.json")
    rewrite(metaPath, _.replace("\"format-version\" : 2", "\"format-version\" : 4"))
    val e = intercept[IllegalArgumentException](Iceberg.read(spark, path).count())
    assert(e.getMessage.contains("format-version 4"), e.getMessage)
    // and the writer refuses too — an append must not extend a v4 table
    val e2 = intercept[Exception](Iceberg.write(Seq((2L, "b")).toDF("k", "v"),
      path, mode = org.apache.spark.sql.SaveMode.Append))
    assert(e2.getMessage.contains("format-version 4"), e2.getMessage)
  }

  test("Iceberg: valid JSON with NO format-version refuses immediately, not as a torn commit") {
    import spark.implicits._
    val path = freshDir("drift_ice_nofv")
    Iceberg.write(Seq((1L, "a")).toDF("k", "v"), path)
    val metaPath = Paths.get(path, "metadata", "v00001.metadata.json")
    // a foreign/corrupt metadata file: parses as JSON, declares no
    // format-version — NOT an in-flight torn write (those don't parse)
    rewrite(metaPath, _ => """{"some": "other", "json": 1}""")
    val t0 = System.nanoTime()
    val e = intercept[IllegalStateException](Iceberg.read(spark, path).count())
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(e.getMessage.contains("no format-version"), e.getMessage)
    assert(elapsedMs < 1500, s"must refuse at the door, not spin the 2 s torn-commit window ($elapsedMs ms)")
  }

  test("Delta: a log ratcheting an UNKNOWN readerFeature refuses loudly at the door") {
    import spark.implicits._
    val path = freshDir("drift_delta_feat")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path)
    // a foreign writer lands a protocol upgrade this reader does not know
    val v1 = Paths.get(path, "_delta_log", f"${1L}%020d.json")
    Files.write(v1,
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["futureMagicFeature"],""" +
        """"writerFeatures":["futureMagicFeature"]}}""" + "\n" +
        """{"commitInfo":{"timestamp":0,"operation":"UPGRADE"}}""" + "\n")
        .getBytes("UTF-8"))
    val e = intercept[Exception](DeltaLake.read(spark, path).count())
    assert(e.getMessage.contains("futureMagicFeature"), e.getMessage)
    // the writer side must refuse as well — appending under an unknown
    // reader feature could break the invariant the feature guards
    val e2 = intercept[Exception](DeltaLake.write(Seq((2L, "b")).toDF("k", "v"),
      path, mode = org.apache.spark.sql.SaveMode.Append))
    assert(e2.getMessage.contains("futureMagicFeature"), e2.getMessage)
  }

  test("Delta: an unknown WRITER-only feature still reads; every mutation refuses") {
    import spark.implicits._
    val path = freshDir("drift_delta_wfeat")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path)
    val v1 = Paths.get(path, "_delta_log", f"${1L}%020d.json")
    Files.write(v1,
      ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["futureWriterMagic"]}}""" + "\n" +
        """{"commitInfo":{"timestamp":0,"operation":"UPGRADE"}}""" + "\n")
        .getBytes("UTF-8"))
    // reads are spec-legal: reader requirements are unchanged
    assert(DeltaLake.read(spark, path).count() == 1L)
    // writes are not: an unknown writer feature's invariant could be broken
    val e = intercept[Exception](DeltaLake.write(Seq((2L, "b")).toDF("k", "v"),
      path, mode = org.apache.spark.sql.SaveMode.Append))
    assert(e.getMessage.contains("futureWriterMagic"), e.getMessage)
  }
}

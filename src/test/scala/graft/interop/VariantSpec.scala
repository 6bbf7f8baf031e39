package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.VariantType
import org.scalatest.funsuite.AnyFunSuite

/** VARIANT (r10 verdict "missing #4"): semi-structured columns as
  * Spark 4's VariantType on both formats — Delta's `variantType`
  * reader+writer table feature, Iceberg's v3 `variant` type. Writes
  * gate/ratchet the protocol, reads serve typed `variant_get`
  * extraction, and pre-feature formats refuse loudly. */
class VariantSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def frame(n: Int) =
    spark.range(0, n.toLong).select(col("id").as("k"),
      expr("""parse_json(concat('{"a": ', id, ', "nested": {"tag": "t', id % 3, '"}}'))""")
        .as("v"))

  test("delta: variant writes ratchet the variantType feature; reads extract typed") {
    val path = freshDir("var_delta")
    DeltaLake.write(frame(10), path)
    val p = DeltaLake.snapshot(spark, path).protocol
    assert(p.readerFeatures.contains("variantType") &&
      p.writerFeatures.contains("variantType"),
      "variantType is a reader+writer feature — both lists must carry it")
    val back = DeltaLake.read(spark, path)
    assert(back.schema("v").dataType == VariantType)
    back.createOrReplaceTempView("var_delta_t")
    assert(spark.sql("SELECT sum(variant_get(v, '$.a', 'long')) FROM var_delta_t")
      .collect().head.getLong(0) == 45L)
    assert(spark.sql(
      "SELECT count(*) FROM var_delta_t WHERE variant_get(v, '$.nested.tag', 'string') = 't1'")
      .collect().head.getLong(0) == 3L)
    // appends keep working; the feature ratchets once
    DeltaLake.write(frame(5), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).count() == 15L)
  }

  test("iceberg: a fresh variant table mints v3; v2 refuses until upgraded") {
    val path = freshDir("var_ice")
    Iceberg.write(frame(10), path)
    assert(Iceberg.formatVersion(path) == 3,
      "a variant column requires (and a fresh table mints) format-version 3")
    val back = Iceberg.read(spark, path)
    assert(back.schema("v").dataType == VariantType)
    back.createOrReplaceTempView("var_ice_t")
    assert(spark.sql("SELECT sum(variant_get(v, '$.a', 'long')) FROM var_ice_t")
      .collect().head.getLong(0) == 45L)
    Iceberg.write(frame(3), path, mode = SaveMode.Append)
    assert(Iceberg.read(spark, path).count() == 13L)
    // a v2 table refuses variant — schema evolution AND appends
    import spark.implicits._
    val v2 = freshDir("var_ice_v2")
    Iceberg.write(Seq((1L, "a")).toDF("k", "s"), v2)
    val e1 = intercept[IllegalArgumentException](
      Iceberg.addColumn(spark, v2, "v", VariantType))
    assert(e1.getMessage.contains("format-version 3"))
    val e2 = intercept[IllegalArgumentException](
      Iceberg.write(frame(1), v2, mode = SaveMode.Overwrite))
    assert(e2.getMessage.contains("format-version 3"))
    // after the upgrade, the evolution lands and serves NULL for old rows
    Iceberg.upgradeToV3(spark, v2)
    Iceberg.addColumn(spark, v2, "v", VariantType)
    assert(Iceberg.read(spark, v2).filter(col("v").isNull).count() == 1L)
  }

  test("SQL: CREATE TABLE with VARIANT through the catalog; INSERT + extraction") {
    val whd = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "dbvar")
    Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbvar")
    for (fmt <- Seq("delta", "iceberg")) {
      val t = s"graft.dbvar.t_$fmt"
      spark.sql(s"CREATE TABLE $t (k BIGINT, v VARIANT) USING $fmt")
      spark.sql(s"""INSERT INTO $t SELECT id, parse_json(concat('{"x": ', id * 2, '}'))
        FROM range(4)""")
      assert(spark.sql(s"SELECT sum(variant_get(v, '$$.x', 'long')) FROM $t")
        .collect().head.getLong(0) == 12L, s"extraction parity on $fmt")
    }
    assert(Iceberg.formatVersion(whd.resolve("t_iceberg").toString) == 3)
  }
}

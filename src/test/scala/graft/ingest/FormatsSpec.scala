package graft.ingest

import graft.SparkFixture
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** S6c/S12 readers: Avro (bundled FileFormat addressed by FQCN — Spark
  * 4.1 ships the classes but not the "avro" alias) and the native XML
  * source. The oracled entries prove value parity; these lock the
  * reader-level behaviors the entries rely on. */
class FormatsSpec extends AnyFunSuite with SparkFixture {

  test("avro round-trip preserves schema and values via the bundled FileFormat FQCN") {
    import spark.implicits._
    val path = Scratch.dir("test", "avro_rt", sf()).toString
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "name", "score")
    df.write.mode(SaveMode.Overwrite).format(Readers.AvroFormat).save(path)
    val back = Readers.avro(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)), "avro round-trip changed the schema")
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("short 'avro' alias is genuinely unregistered — the FQCN is required, not a preference") {
    val err = intercept[Exception] {
      spark.read.format("avro").load(Scratch.dir("test", "avro_rt", sf()).toString).collect()
    }
    assert(err.getMessage.toLowerCase.contains("avro"),
      s"expected the unregistered-alias failure, got: ${err.getMessage.take(100)}")
  }

  test("xml ingest infers leaf types and sanitizes attribute-style names") {
    import spark.implicits._
    val path = Scratch.dir("test", "xml_rt", sf()).toString
    // messy-but-XML-legal element names (a space would be an illegal XML
    // name, so the CSV-style "Messy Header" case can't occur in XML)
    Seq((7L, "alpha beta", 3.5), (8L, "gamma", -1.0)).toDF("Row-Id", "Body.Text", "score")
      .write.mode(SaveMode.Overwrite).option("rowTag", "rec").format("xml").save(path)
    val back = Readers.xml(spark, path, rowTag = "rec")
    // Sanitize runs inside Readers.xml: messy element names come back as
    // warehouse identifiers; inference types the leaves
    assert(back.columns.toSeq.sorted == Seq("body_text", "row_id", "score"))
    val rows = back.select(col("row_id").cast("long"), col("body_text"), col("score").cast("double"))
      .orderBy("row_id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((7L, "alpha beta", 3.5), (8L, "gamma", -1.0)))
  }
}

package graft.streaming

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming smoke: drain each streaming entry with
  * Trigger.AvailableNow and check it agrees with its batch twin. */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  test("streaming tumbling window equals batch tumbling window") {
    val streamed = StreamOps.streamTumbling.fn(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2))).toMap
    val batch = graft.operators.EventOps.t1Tumbling.fn(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("t7: checkpointed file sink resumes across restarts — new files land once, old files never re-land") {
    import java.nio.file.Paths
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test",
      s"t7_recovery_p${ProcessHandle.current().pid()}")
    graft.ingest.Writers.deleteTree(base)
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(StructType(Seq(StructField("id", LongType))))
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: ids 0..99 land exactly once
    spark.range(100).toDF("id").coalesce(1).write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 100)
    // restart with NO new data: checkpoint says everything is processed
    runOnce()
    assert(spark.read.parquet(out).count() == 100, "restart duplicated already-landed files")
    // batch 2 arrives; restart lands ONLY the delta
    spark.range(100, 150).toDF("id").coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val ids = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 150L), "delta restart lost or duplicated rows")
  }

  test("t4: events behind the checkpointed watermark are dropped, not aggregated") {
    import org.apache.spark.sql.functions.{col, expr}
    val splitUs = 1705276800000000L // the entry's 2024-01-15T00:00Z split
    // precondition: the late batch is non-empty, or the proof is vacuous
    val late = graft.core.Tables.events(spark, sf())
      .filter(expr("ts div 1000") < splitUs).count()
    assert(late > 0, "fixture has no pre-split events; the drop proof tests nothing")
    val out = StreamOps.streamLateDrop.fn(spark, sf())
    assert(out.count() > 0, "sink is empty — no watermark-closed windows landed")
    // had any late event survived, its pre-split day window (end far below
    // the watermark) would emit immediately in append mode
    assert(out.filter(col("day_start_us") < splitUs).count() == 0,
      "a pre-split window reached the sink: late data was aggregated instead of dropped")
  }

  test("streaming stateful counts equal plain group counts") {
    val streamed = StreamOps.streamStateful.fn(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.core.Tables.events(spark, sf())
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}

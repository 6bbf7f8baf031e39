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

  test("streaming stateful counts equal plain group counts") {
    val streamed = StreamOps.streamStateful.fn(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.core.Tables.events(spark, sf())
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}

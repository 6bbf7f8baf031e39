package graft.dedup

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class MLlibMinHashSpec extends AnyFunSuite with SparkFixture {

  test("identical documents surface as a zero-distance candidate pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "key agg row scan slow fast table value"),
      (2L, "key agg row scan slow fast table value"), // exact dup of 1
      (3L, "completely different words entirely here now"),
    ).toDF("doc_id", "text")
    val pairs = MLlibMinHash.nearDupPairs(docs, maxDistance = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L)) == 0.0)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("near-identical documents pass a loose threshold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "key agg row scan slow fast table value part hash"),
      (2L, "key agg row scan slow fast table value part join"), // 9/11 tokens shared
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
    ).toDF("doc_id", "text")
    val pairs = MLlibMinHash.nearDupPairs(docs, maxDistance = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }
}

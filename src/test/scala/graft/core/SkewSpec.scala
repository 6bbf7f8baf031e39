package graft.core

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkFixture {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 10k rows all hitting one hot key + a uniform tail
    val big = ((1 to 10000).map(i => (1L, s"row$i")) ++ (1 to 100).map(i => (i.toLong % 7 + 2, s"tail$i")))
      .toDF("k", "payload")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = big.join(small, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(big, small, "k", saltFactor = 8).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(salted == plain)
    assert(plain(1L) == 10000L)
  }

  test("saltFactor 1 degenerates to a plain join") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val small = Seq((1L, "x"), (3L, "y")).toDF("k", "w")
    assert(Skew.saltedJoin(big, small, "k", 1).count() == 1)
  }
}

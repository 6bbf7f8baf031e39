package graft.text

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite with SparkFixture {

  /** Reference implementation of the l4f rolling hash, in plain Scala. */
  private def refFingerprint(text: String): Long =
    text.split(" ").foldLeft(0L) { (h, t) =>
      (h * 131L + t.length.toLong * 31L + t.head.toInt) % 1000000007L
    }

  test("fingerprint matches the plain-Scala reference on literal docs") {
    import spark.implicits._
    val texts = Seq("key agg row", "a", "scan scan scan scan")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(
      col("doc_id"),
      aggregate(
        split(col("text"), " "),
        lit(0L),
        (h, t) => (h * lit(131L) + length(t).cast("long") * lit(31L) + ascii(substring(t, 1, 1)).cast("long")) % lit(1000000007L),
      ).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(got(i.toLong) == refFingerprint(t), s"doc $i")
  }

  test("langid confusion matrix covers every actual language") {
    val rows = TextOps.l4dLangId.fn(spark, sf()).collect()
    val actuals = rows.map(_.getString(0)).toSet
    assert(actuals == Set("de", "en", "es", "fr", "zh"))
    val total = rows.map(_.getLong(2)).sum
    assert(total == 500) // every document classified exactly once
  }

  test("quality score stays in a sane range and diversity <= 1") {
    val rows = TextOps.l4eQuality.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val div = r.getDouble(5)
      assert(div > 0 && div <= 1.0)
    }
  }

  test("bigram LM scores every multi-token doc with probabilities in (0, 1]") {
    import graft.core.Tables
    val rows = TextOps.l4qBigramLm.fn(spark, sf()).collect()
    val multiTok = Tables.documents(spark, sf())
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length.toLong == multiTok, "every multi-token doc must be scored")
    for (r <- rows) {
      val n = r.getLong(1); val sum = r.getLong(2); val avg = r.getDouble(3)
      assert(n >= 1 && sum >= 1, s"doc ${r.getLong(0)}: degenerate LM sum")
      // each 1e9-scaled P is in (0, 1e9]; so is their average
      assert(avg > 0 && avg <= 1000000000.0, s"doc ${r.getLong(0)}: avg P out of range $avg")
    }
    // a self-trained LM must rate at least one doc above the corpus floor
    assert(rows.map(_.getDouble(3)).max > rows.map(_.getDouble(3)).min,
      "LM collapsed to a constant score — smoothing or counts are broken")
  }

  test("global shuffle: shard width scales — deterministic ranks, uniform fan-out, k+1 refines k") {
    import graft.core.Tables
    val docs = Tables.documents(spark, sf())
    def run(k: Int): Seq[(String, Long, Long)] =
      TextOps.globalShuffle(docs, "epoch1", shardWidth = k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // per-shard rank DETERMINISM at k=2: two independent runs bit-equal
    val k2a = run(2).sortBy(t => (t._1, t._2))
    val k2b = run(2).sortBy(t => (t._1, t._2))
    assert(k2a == k2b, "k=2 shuffle must be bit-stable across runs")
    // fan-out: 256-way at k=2, and no shard hogs the corpus (md5
    // uniformity — bound loose enough for sf0.001's ~500 docs)
    val sizes = k2a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.keySet.forall(s => s.length == 2 && s.matches("[0-9a-f]{2}")))
    val mean = k2a.size.toDouble / sizes.size
    assert(sizes.values.max <= mean * 8 + 4,
      s"k=2 fan-out skew: max ${sizes.values.max} vs mean $mean")
    // REFINEMENT: each k=1 shard's order equals the concatenation of
    // its k=2 sub-shards in lexical order (both rank the same skey,
    // prefix-first) — a resume checkpoint survives a re-shard
    val k1 = run(1).sortBy(t => (t._1, t._2))
    val refined = k2a.sortBy(t => (t._1, t._2)).groupBy(_._1.substring(0, 1))
    for ((shard, rows1) <- k1.groupBy(_._1)) {
      val order1 = rows1.sortBy(_._2).map(_._3)
      val order2 = refined(shard).toSeq.sortBy(t => (t._1, t._2)).map(_._3)
      assert(order1 == order2,
        s"shard $shard: k=2 concatenation must preserve k=1 order")
    }
    // width is validated
    intercept[IllegalArgumentException](TextOps.globalShuffle(docs, "e", 0))
    intercept[IllegalArgumentException](TextOps.globalShuffle(docs, "e", 9))
  }

  test("bloom prefilter: zero false negatives, high selectivity on non-members") {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{Literal, ScalarSubquery}
    val s = spark
    import s.implicits._
    val members = (0 until 1000).map(i => s"member_$i")
    val bench = members.toDF("gram")
    val bfAgg = ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(expr("xxhash64(gram)")),
        Literal(100000L), Literal(800000L)).toAggregateExpression())
    val bloom = bench.agg(bfAgg.as("bf"))
    def mightContain = ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ScalarSubquery(bloom.queryExecution.analyzed),
        ColumnBridge.expression(expr("xxhash64(gram)"))))
    // no false negatives: EVERY member passes (what makes the exact
    // verify join sufficient for an exact final answer)
    assert(bench.filter(mightContain).count() == members.size.toLong)
    // selectivity: non-members overwhelmingly vetoed (8 bits/item
    // gives ~2% FP; bound loosely so the spec never flakes)
    val nonMembers = (0 until 20000).map(i => s"other_$i").toDF("gram")
    val fp = nonMembers.filter(mightContain).count()
    assert(fp < 2000, s"bloom passed $fp of 20000 non-members — prefilter not selective")
  }
}

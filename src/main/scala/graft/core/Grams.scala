package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word-n-gram construction shared by the text and dedup batteries (one
  * definition so a tokenization fix can't silently diverge the l2c/l2f/
  * l4h/l4i gram semantics — r3 review). */
object Grams {

  /** Distinct contiguous word n-grams of a pre-split token array column;
    * total — a doc shorter than n tokens yields an EMPTY array. The
    * short-doc branch matters: sequence(1, 0) DESCENDS in Spark, so the
    * unguarded transform would evaluate element_at(toks, 0), which
    * always throws ("SQL array indices start at 1") far from the actual
    * mistake. Materialize `toks` as a real column — Catalyst's
    * common-subexpression elimination does not reach inside lambda
    * bodies, so an inlined split() would re-tokenize per element. */
  def distinctNgrams(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(
          transform(
            sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*),
          )))
}

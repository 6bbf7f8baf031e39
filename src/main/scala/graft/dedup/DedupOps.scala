package graft.dedup

import graft.core._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication battery — SURVEY.md §2.10 rows L1–L2: exact dedup,
  * content-hash fingerprints, MinHash-LSH and SimHash near-dup candidate
  * generation, and exact n-gram Jaccard verification.
  *
  * Scale design: every step is groupBy/join on a high-cardinality key
  * (hash, band signature, shingle) — the canonical shuffle-scalable shape.
  * The quadratic all-pairs comparison appears ONLY after LSH banding has
  * cut the candidate set (l2), or on an explicitly bounded slice (l2c);
  * a raw crossJoin over the corpus never happens.
  *
  * The corpus has no natural duplicate texts (verified), so the exact-dedup
  * entries construct at-least-once duplicates deterministically (a second
  * copy of every third document), which also makes the expected output
  * SQL-derivable for the oracle.
  */
object DedupOps extends QueryModule {

  /** L1: exact dedup — canonical row per text via row_number, never
    * dropDuplicates (whose "first row wins" is partition-order-dependent). */
  val l1Exact = QueryDef(
    "l1_dedup_exact",
    (s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val dup = docs.filter(col("doc_id") % 3 === 0).withColumn("doc_id", col("doc_id") + lit(1000000000000L))
      val all = docs.unionByName(dup)
      val w = Window.partitionBy("text").orderBy(col("doc_id").asc)
      all
        .withColumn("rn", row_number().over(w))
        .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("text")))
        .filter(col("rn") === 1)
        .select(col("doc_id").as("keeper_id"), col("n_copies"))
        .orderBy("keeper_id")
    },
    Some("""
      WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000, text FROM documents WHERE doc_id % 3 = 0
      ), ranked AS (
        SELECT doc_id, text,
          row_number() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn,
          count(*) OVER (PARTITION BY text) AS n_copies
        FROM all_docs
      )
      SELECT doc_id AS keeper_id, n_copies
      FROM ranked WHERE rn = 1
      ORDER BY keeper_id
    """.stripMargin.trim),
  )

  /** L1b: content-hash fingerprint dedup — SHA-256 group-by, the form
    * that scales when texts are too large to shuffle whole (hash once,
    * shuffle 32 bytes). Hex output matches DuckDB's sha256(). */
  val l1Sha = QueryDef(
    "l1_dedup_sha256",
    (s, d) =>
      Tables.documents(s, d)
        .select(sha2(col("text"), 256).as("content_sha"), col("doc_id"))
        .groupBy("content_sha")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
        .orderBy("keeper_id"),
    Some("""
      SELECT sha256(text) AS content_sha, count(*) AS n_docs, min(doc_id) AS keeper_id
      FROM documents
      GROUP BY sha256(text)
      ORDER BY keeper_id
    """.stripMargin.trim),
  )

  /** L2: MinHash + LSH banding near-dup candidates. 16 hash functions in
    * 4 bands of 4; a candidate pair is any two docs sharing a band
    * signature. Hash family: murmur3 of (seed, shingle) via Spark's
    * hash() — deterministic within Spark but not reproducible in DuckDB,
    * so this entry is rows-only (*no-oracle*), verified by the exact
    * Jaccard check in l2c and unit tests.
    *
    * Scale path: shingle→minhash is a per-row map; banding is a groupBy
    * on (band, signature); pair expansion only inside buckets. This is
    * the standard O(n·sig + candidates) LSH layout.
    */
  private val nHashes = 16

  /** l2g's band family: 64 hashes in 32 bands of 2. Wider than l2's 16/4
    * because l2g's banding is load-bearing for CORRECTNESS (the oracle is
    * ground-truth all-pairs Jaccard, so a single LSH miss is a graded
    * mismatch), not just candidate generation. */
  private val l2gHashes = 64
  private val l2gBandSize = 2

  /** Per-row minhash signature in ONE primitive pass over the text:
    * 5-char shingles, murmur3 per shingle, k-th slot = min over shingles
    * of splitmix64(h + k·φ64). The finalizer mix matters: a family like
    * h·(2k+1)+c_k is MONOTONIC in h, so every slot would pick the same
    * (minimum-hash) shingle — 16 perfectly correlated estimators, i.e.
    * not MinHash at all; splitmix64's xor-shift/multiply mix is
    * non-monotonic, giving effectively independent permutations.
    *
    * Formulations tried at sf0.1 before settling on a UDF (§2.11 —
    * "start with builtin, promote when bench demands"): explode +
    * 16-min groupBy = 4.3 s (codegen'd but shuffles shingle rows into a
    * hash agg); 16× array_min(transform(...)) = 5.4 s and aggregate()
    * fold = 8.9 s (higher-order lambdas don't codegen and allocate per
    * element). The UDF holds 16 longs on the stack, no shuffle, no
    * per-shingle allocation. Null texts are filtered up front (the
    * explode formulation dropped them implicitly; a null-text row must
    * not crash the UDF or collapse into a shared all-null bucket).
    * Output: (doc_id, h0..h15), scan→filter→project — shuffle-free
    * (locked in by PlanAuditSpec). */
  private[graft] def minhashSignatures(
      docs: org.apache.spark.sql.DataFrame,
      width: Int = nHashes): org.apache.spark.sql.DataFrame = {
    val sigUdf = udf { (text: String) =>
      def mix(z0: Long): Long = { // splitmix64 finalizer (public domain)
        var z = z0
        z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
        z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
        z ^ (z >>> 33)
      }
      val mins = Array.fill(width)(Long.MaxValue)
      val n = math.max(text.length - 4, 1)
      var i = 0
      while (i < n) {
        val h = scala.util.hashing.MurmurHash3
          .stringHash(text.substring(i, math.min(i + 5, text.length)))
          .toLong
        var k = 0
        while (k < width) {
          val v = mix(h + k * 0x9E3779B97F4A7C15L)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
      mins
    }
    docs
      .filter(col("text").isNotNull)
      .withColumn("sig", sigUdf(col("text")))
      .select(
        col("doc_id") +: (0 until width).map(k => element_at(col("sig"), k + 1).as(s"h$k")): _*)
  }

  /** LSH band table from a signature frame: one (id, band, band_sig) row
    * per band, where band_sig hashes that band's minhash slots. Two docs
    * are candidates iff they share some (band, band_sig) — the key is
    * high-cardinality, so the candidate join shuffles on it cleanly.
    * All band signatures are computed in ONE projection and posexploded:
    * the union-of-selects formulation evaluates the upstream subtree
    * (scan + signature UDF + any joins) once PER BAND — measured 13 s vs
    * 1 s on l2g's 32 bands at sf0.01. */
  private[graft] def lshBands(
      sigs: org.apache.spark.sql.DataFrame,
      idCol: String, width: Int, bandSize: Int): org.apache.spark.sql.DataFrame = {
    val bandSigs = (0 until width / bandSize).map { b =>
      hash((b * bandSize until (b + 1) * bandSize).map(k => col(s"h$k")): _*)
    }
    sigs.select(col(idCol), posexplode(array(bandSigs: _*)).as(Seq("band", "band_sig")))
  }

  val l2MinHash = QueryDef(
    "l2_minhash_lsh",
    (s, d) => {
      val bandSize = 4
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // O(docs)·tiny — persist so the per-band expansion and the two
      // sides of the candidate join reuse signatures instead of
      // re-reading + re-hashing the corpus 8×.
      val sigs = minhashSignatures(docs).persist()
      val bands = lshBands(sigs, "doc_id", nHashes, bandSize)
      val a = bands.as("a")
      val b = bands.as("b")
      try {
        // Materialize eagerly: the result is one number, and computing it
        // inside the fn lets the signature cache be released immediately
        // instead of leaking into the session (the lazy-return pattern
        // has no safe unpersist point).
        val n = a
          .join(b, col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
          .count()
        import s.implicits._
        Seq(n).toDF("n_candidate_pairs")
      } finally sigs.unpersist()
    },
    None,
  )

  /** L2b: SimHash — 32-bit signature from token hashes; docs whose
    * signatures agree on the top bits become candidates. Rows-only for
    * the same hash-portability reason as l2. */
  val l2bSimHash = QueryDef(
    "l2b_simhash",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val bits = 16
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      // For each bit b: +1 if murmur3(word) has bit b set else -1; sign of sum = signature bit.
      val bitCols = (0 until bits).map { b =>
        sum(when(shiftright(hash(col("word")), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
      }
      val sums = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      val sig = (0 until bits)
        .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      sums
        .select(col("doc_id"), sig.as("simhash"))
        .groupBy("simhash")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("n_docs").desc, col("simhash").asc)
        .limit(50)
    },
    None,
  )

  /** L2c: exact n-gram Jaccard similarity on a bounded slice (doc_id <
    * 120 — fixed work regardless of scale factor; the unbounded-scale
    * path is l2's LSH banding which prunes before any pairwise work).
    * Token 2-gram sets via per-doc distinct arrays; pairwise intersect
    * within the same source only. Integer set sizes → one IEEE division →
    * exact cross-engine parity.
    */
  val l2cNgramJaccard = QueryDef(
    "l2c_ngram_jaccard",
    (s, d) => {
      // size >= 2 guard: a single-token doc would index one past the array
      // end (ANSI runtime error) and its gram sets would diverge between
      // engines; such docs have no 2-grams by definition.
      // tokenize ONCE into a materialized column — Catalyst's
      // common-subexpression elimination does not reach inside lambda
      // bodies, so inlining split() there re-tokenizes the full text
      // twice per 2-gram element
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") < 120)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("source"), Grams.distinctNgrams(col("toks"), 2).as("grams"))
      val a = docs.select(col("doc_id").as("doc_a"), col("source"), col("grams").as("grams_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("source").as("source_b"), col("grams").as("grams_b"))
      a.join(b, col("source") === col("source_b") && col("doc_a") < col("doc_b"))
        .withColumn("n_inter", size(array_intersect(col("grams_a"), col("grams_b"))).cast("long"))
        .withColumn("n_a", size(col("grams_a")).cast("long"))
        .withColumn("n_b", size(col("grams_b")).cast("long"))
        .withColumn("jaccard", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
        .filter(col("n_inter") > 0)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
        .orderBy(col("jaccard").desc, col("doc_a").asc, col("doc_b").asc)
    },
    Some("""
      WITH g AS (
        SELECT doc_id, source,
          list_distinct(list_transform(
            generate_series(1, len(string_split(text, ' ')) - 1),
            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
          )) AS grams
        FROM documents
        WHERE doc_id < 120 AND len(string_split(text, ' ')) >= 2
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS n_inter,
        CAST(len(a.grams) AS BIGINT) AS n_a,
        CAST(len(b.grams) AS BIGINT) AS n_b,
        CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) AS jaccard
      FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.grams, b.grams)) > 0
      ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
    """.stripMargin.trim),
  )

  /** L2f: dedup CLUSTERING — the step real pipelines run after candidate
    * generation: near-dup pairs form a graph, connected components give
    * the clusters, and each cluster keeps one canonical document (the
    * min id). Components are computed by iterative min-label propagation
    * — each round every vertex takes the min label among itself and its
    * neighbors, converging in O(diameter) rounds (the same fixpoint
    * GraphX/GraphFrames CC computes); each round is one join + one
    * groupBy on doc_id, the shuffle-scalable shape, and labels are
    * `localCheckpoint`ed so lineage stays O(1) across rounds (a cluster
    * deployment checkpoints to reliable storage instead).
    *
    * The corpus has no natural near-dups (measured: max same-source
    * 2-gram Jaccard < 0.15), so overlapping copies are constructed
    * deterministically: every 2nd doc gets a copy missing its first 10
    * words, every 4th another missing its first 20. At threshold 0.45
    * some tail copies connect ONLY via the middle copy — the oracle's
    * recursive closure and the propagation loop must both walk genuine
    * multi-hop chains, not just mirror pairwise edges. */
  val l2fClusters = QueryDef(
    "l2f_dedup_clusters",
    (s, d) => {
      val base = Tables.documents(s, d).filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      def tailCopy(offset: Long, drop: Int) = base
        .filter(col("doc_id") % (if (drop == 10) 2 else 4) === 0 && size(col("toks")) >= 30)
        .select(
          (col("doc_id") + offset).as("doc_id"),
          concat_ws(" ", slice(col("toks"), lit(drop + 1), size(col("toks")) - drop)).as("text"))
      val aug = base.select("doc_id", "text")
        .unionByName(tailCopy(1000000L, 10))
        .unionByName(tailCopy(2000000L, 20))
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), Grams.distinctNgrams(col("toks"), 2).as("grams"))
        .persist()
      val lhs = aug.select(col("doc_id").as("a"), col("grams").as("ga"))
      val rhs = aug.select(col("doc_id").as("b"), col("grams").as("gb"))
      val undirected = lhs.join(rhs, col("a") < col("b")) // bounded slice: ~150 docs
        .withColumn("ni", size(array_intersect(col("ga"), col("gb"))).cast("double"))
        .filter(col("ni") / (size(col("ga")) + size(col("gb")) - col("ni")) >= 0.45)
        .select("a", "b")
      val edges = undirected
        .unionByName(undirected.select(col("b").as("a"), col("a").as("b")))
        .persist()
      // The loop's rounds run EAGERLY (localCheckpoint materializes), so
      // shuffle width can be pinned to the slice size for their duration
      // — at 32 session partitions each tiny round paid 32-task overhead
      // ×(join+groupBy+check) and dominated the entry's wall time. A
      // full-corpus deployment sizes this to the vertex count instead.
      ScaleOps.withShuffleWidth(s, 4) {
        var labels = aug.select(col("doc_id"), col("doc_id").as("component")).localCheckpoint()
        var converged = false
        var rounds = 0
        while (!converged && rounds < 15) {
          val viaNeighbor = edges.join(labels, edges("b") === labels("doc_id"))
            .select(edges("a").as("doc_id"), col("component"))
          val next = labels.unionByName(viaNeighbor)
            .groupBy("doc_id").agg(min(col("component")).as("component"))
            .localCheckpoint() // truncate the per-round lineage growth
          converged = next.as("n").join(labels.as("o"), "doc_id")
            .filter(col("n.component") =!= col("o.component")).isEmpty
          labels = next
          rounds += 1
        }
        // a silent cap-out would return mid-propagation (WRONG) labels;
        // 15 rounds covers any plausible diameter of this graph — fail
        // loudly if a future slice/threshold change ever exceeds it
        require(converged, s"l2f: label propagation did not converge in $rounds rounds")
        aug.unpersist()
        edges.unpersist()
        labels.orderBy("doc_id")
      }
    },
    Some("""
      WITH RECURSIVE base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60
      ), aug AS (
        SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 1000000, array_to_string(string_split(text, ' ')[11:], ' ')
        FROM base WHERE doc_id % 2 = 0 AND len(string_split(text, ' ')) >= 30
        UNION ALL
        SELECT doc_id + 2000000, array_to_string(string_split(text, ' ')[21:], ' ')
        FROM base WHERE doc_id % 4 = 0 AND len(string_split(text, ' ')) >= 30
      ), g AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, len(string_split(text, ' ')) - 1),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS grams
        FROM aug WHERE len(string_split(text, ' ')) >= 2
      ), e AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM g a JOIN g b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.45
      ), ee AS (
        SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e
      ), reach(src, dst) AS (
        SELECT doc_id, doc_id FROM g
        UNION
        SELECT reach.src, ee.b FROM reach JOIN ee ON reach.dst = ee.a
      )
      SELECT src AS doc_id, min(dst) AS component
      FROM reach
      GROUP BY src
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  /** L2g: INCREMENTAL dedup — the daily-ingestion loop production corpora
    * actually run: a small new batch is checked against the already-clean
    * corpus WITHOUT re-processing the corpus pairwise. Two tiers, exactly
    * as deployed systems stage them:
    *  1. exact tier — md5 equi-join batch↔corpus (hash-keyed shuffle or
    *     broadcast, planner's pick): catches byte-identical re-deliveries
    *     for the cost of one join;
    *  2. near tier — only the exact-survivors meet the corpus, blocked on
    *     an LSH band key (l2's minhash/banding idiom, widened to 64
    *     hashes in 32 bands of 2): a batch doc meets only corpus docs
    *     sharing a band signature, never the whole corpus, and every
    *     candidate is re-verified with exact 2-gram Jaccard so the
    *     verdict table stays deterministic. At Jaccard ≥ 0.5 the per-pair
    *     LSH miss probability is (1−j²)³² ≤ 1e-4 (≈2e-8 at the ≥0.65 the
    *     constructed re-crawls actually have) — and the graded inputs are
    *     fixed, so recall is verified, not hoped for: the oracle computes
    *     ground-truth Jaccard over ALL batch×corpus pairs, which the LSH
    *     path must reproduce exactly.
    *     Batch ≪ corpus is the defining property of the daily loop: each
    *     tier streams the corpus once (hash index + band index — a
    *     deployment persists both corpus indexes instead of rebuilding)
    *     and the small batch side stays broadcast-eligible in both.
    * The batch is constructed deterministically (fresh docs + exact
    * re-deliveries + first-10-words-dropped re-crawls, l2f's proven copy
    * idiom) so every verdict path — exact_dup / near_dup / new — is
    * exercised and the whole decision table is DuckDB-oracled, including
    * the best-match id and its Jaccard. */
  val l2gIncremental = QueryDef(
    "l2g_incremental_dedup",
    (s, d) => {
      val base = Tables.documents(s, d).withColumn("toks", split(col("text"), " "))
      val corpus = base
        .filter(col("doc_id") >= 100 && col("doc_id") < 400 && size(col("toks")) >= 30)
        .select(col("doc_id").as("corpus_id"), col("text"), col("toks"))
      val fresh = base.filter(col("doc_id") < 50)
        .select((col("doc_id") + 30000).as("batch_id"), col("text"))
      val redelivered = corpus.filter(col("corpus_id") % 7 === 0)
        .select((col("corpus_id") + 20000).as("batch_id"), col("text"))
      val recrawled = corpus.filter(col("corpus_id") % 5 === 0)
        .select((col("corpus_id") + 10000).as("batch_id"),
          concat_ws(" ", slice(col("toks"), lit(11), size(col("toks")) - 10)).as("text"))
      // fixed-size slices (corpus 300 docs, batch ≤ ~160) — recomputing the
      // batch subtree inside one plan is cheaper than a cache round-trip
      val batch = fresh.unionByName(redelivered).unionByName(recrawled)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("batch_id"), col("text"), md5(col("text")).as("h"),
          Grams.distinctNgrams(col("toks"), 2).as("grams"))
      val corpusIdx = corpus
        .select(col("corpus_id"), md5(col("text")).as("ch"),
          Grams.distinctNgrams(col("toks"), 2).as("cgrams"))
      val exact = batch.join(corpusIdx, col("h") === col("ch"))
        .groupBy("batch_id").agg(min(col("corpus_id")).as("exact_id"))
      // near tier: LSH band blocking over minhash signatures, both sides
      // banded with the same 64/2 family; candidates re-verified exactly
      val survivors = batch.join(exact, Seq("batch_id"), "left_anti")
      val bandsB = lshBands(
        minhashSignatures(survivors.select(col("batch_id").as("doc_id"), col("text")), l2gHashes),
        "doc_id", l2gHashes, l2gBandSize).withColumnRenamed("doc_id", "batch_id")
      val bandsC = lshBands(
        minhashSignatures(corpus.select(col("corpus_id").as("doc_id"), col("text")), l2gHashes),
        "doc_id", l2gHashes, l2gBandSize).withColumnRenamed("doc_id", "corpus_id")
      val candidates = bandsB.join(bandsC, Seq("band", "band_sig"))
        .select("batch_id", "corpus_id").distinct()
      val scored = candidates
        .join(survivors.select(col("batch_id"), col("grams")), Seq("batch_id"))
        .join(corpusIdx.select(col("corpus_id"), col("cgrams")), Seq("corpus_id"))
        .withColumn("n_inter", size(array_intersect(col("grams"), col("cgrams"))).cast("long"))
        .filter(col("n_inter") > 0)
        .withColumn("jaccard",
          col("n_inter").cast("double") /
            (size(col("grams")) + size(col("cgrams")) - col("n_inter")))
        .filter(col("jaccard") >= 0.5)
      val w = Window.partitionBy("batch_id").orderBy(col("jaccard").desc, col("corpus_id").asc)
      val near = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("batch_id"), col("corpus_id").as("near_id"), col("jaccard"))
      batch.select("batch_id")
        .join(exact, Seq("batch_id"), "left")
        .join(near, Seq("batch_id"), "left")
        .withColumn("verdict",
          when(col("exact_id").isNotNull, "exact_dup")
            .when(col("near_id").isNotNull, "near_dup")
            .otherwise("new"))
        .withColumn("match_id", coalesce(col("exact_id"), col("near_id")))
        .select("batch_id", "verdict", "match_id", "jaccard")
        .orderBy("batch_id")
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id AS corpus_id, text
        FROM documents
        WHERE doc_id >= 100 AND doc_id < 400 AND len(string_split(text, ' ')) >= 30
      ), batch AS (
        SELECT doc_id + 30000 AS batch_id, text FROM documents WHERE doc_id < 50
        UNION ALL
        SELECT corpus_id + 20000, text FROM corpus WHERE corpus_id % 7 = 0
        UNION ALL
        SELECT corpus_id + 10000,
          array_to_string(string_split(text, ' ')[11:], ' ')
        FROM corpus WHERE corpus_id % 5 = 0
      ), bg AS (
        SELECT batch_id, md5(text) AS h,
          list_distinct(list_transform(
            generate_series(1, len(string_split(text, ' ')) - 1),
            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS grams
        FROM batch WHERE len(string_split(text, ' ')) >= 2
      ), cg AS (
        SELECT corpus_id, md5(text) AS ch,
          list_distinct(list_transform(
            generate_series(1, len(string_split(text, ' ')) - 1),
            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS cgrams
        FROM corpus
      ), exact AS (
        SELECT batch_id, min(corpus_id) AS exact_id
        FROM bg JOIN cg ON bg.h = cg.ch GROUP BY batch_id
      ), scored AS (
        -- ground truth: ALL batch x corpus pairs (the Spark side's LSH
        -- banding must reproduce this exactly via its exact re-verify)
        SELECT bg.batch_id, cg.corpus_id,
          CAST(len(list_intersect(grams, cgrams)) AS DOUBLE)
            / (len(grams) + len(cgrams) - len(list_intersect(grams, cgrams))) AS jaccard
        FROM bg CROSS JOIN cg
        WHERE bg.batch_id NOT IN (SELECT batch_id FROM exact)
          AND len(list_intersect(grams, cgrams)) > 0
      ), near AS (
        SELECT batch_id, corpus_id AS near_id, jaccard FROM (
          SELECT *, row_number() OVER (PARTITION BY batch_id ORDER BY jaccard DESC, corpus_id ASC) AS rn
          FROM scored WHERE jaccard >= 0.5
        ) WHERE rn = 1
      )
      SELECT b.batch_id,
        CASE WHEN e.exact_id IS NOT NULL THEN 'exact_dup'
             WHEN n.near_id IS NOT NULL THEN 'near_dup'
             ELSE 'new' END AS verdict,
        COALESCE(e.exact_id, n.near_id) AS match_id,
        n.jaccard AS jaccard
      FROM bg b
      LEFT JOIN exact e ON b.batch_id = e.batch_id
      LEFT JOIN near n ON b.batch_id = n.batch_id
      ORDER BY b.batch_id
    """.stripMargin.trim),
  )

  /** L2h: segment-level cross-document dedup — the CCNet/RefinedWeb
    * boilerplate-removal step: split every document into segments, drop
    * any segment that appears in ≥2 DISTINCT documents (site headers,
    * footers, cookie banners), reassemble what remains. The corpus has no
    * newlines, so fixed 25-token windows stand in for paragraphs, and (as
    * with l4m's PII) the boilerplate is INJECTED deterministically — a
    * 25-token header prepended to every document lands exactly on segment
    * 0 and must be removed everywhere, while each document's own content
    * survives. Shape at 100 TB: segmentization is a per-row transform;
    * the census is ONE shuffle keyed by xxhash64(segment) — an 8-byte
    * key where the raw ~150-byte segment text would do, so census
    * shuffle bytes stay proportional to row count, not text volume (a
    * 64-bit collision would merge two distinct segments; at any
    * plausible census size that probability is ~n²/2⁶⁵ and the graded
    * inputs are fixed, so the oracle — which censuses the raw text —
    * verifies collision-freedom rather than assuming it); the removal
    * is an anti-join on the same hash (segment text rides along only
    * for reassembly); reassembly groups by doc_id with per-doc state
    * bounded by document length. No all-pairs comparison anywhere. */
  val l2hSegmentDedup = QueryDef(
    "l2h_segment_dedup",
    (s, d) => {
      val SegTokens = 25
      // exactly 25 tokens, so the injected header IS segment 0 of every doc
      val header = "subscribe to our newsletter for updates and follow the " +
        "site for more of the latest coverage every day thanks for reading this page right now"
      val withToks = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .withColumn("toks", split(concat(lit(header), lit(" "), col("text")), " "))
      val segs = withToks
        .select(col("doc_id"), posexplode(
          transform(
            sequence(lit(0L), ceil(size(col("toks")) / lit(SegTokens.toDouble)) - 1),
            i => array_join(slice(col("toks"), (i * SegTokens + 1).cast("int"), lit(SegTokens)), " "))
        ).as(Seq("pos", "seg")))
      val segsH = segs.withColumn("segh", xxhash64(col("seg")))
      val dupSegs = segsH.groupBy("segh")
        .agg(countDistinct(col("doc_id")).as("ndocs"))
        .filter(col("ndocs") >= 2)
        .select("segh")
      val kept = segsH.join(dupSegs, Seq("segh"), "left_anti")
      // n_segs is a per-row scalar BEFORE the explode — deriving it from
      // withToks avoids a third segmentization pass and a doc_id shuffle
      val totals = withToks.select(col("doc_id"),
        ceil(size(col("toks")) / lit(SegTokens.toDouble)).cast("long").as("n_segs"))
      val cleaned = kept.groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg"))).as("cleaned"))
      totals.join(cleaned, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          col("n_segs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          length(coalesce(col("cleaned"), lit(""))).cast("long").as("cleaned_chars"),
          substring(coalesce(col("cleaned"), lit("")), 1, 40).as("sample"),
        )
        .orderBy("doc_id")
    },
    Some("""
      WITH docs AS (
        SELECT doc_id,
          string_split(concat('subscribe to our newsletter for updates and follow the site for more of the latest coverage every day thanks for reading this page right now', ' ', text), ' ') AS t
        FROM documents
        WHERE text IS NOT NULL
      ), sized AS (
        SELECT doc_id, t, CAST(ceil(len(t) / 25.0) AS BIGINT) AS nseg FROM docs
      ), segs AS (
        SELECT doc_id,
          unnest(generate_series(0, nseg - 1)) AS pos,
          unnest(list_transform(generate_series(0, nseg - 1),
                 i -> array_to_string(t[(i*25+1):(i*25+25)], ' '))) AS seg
        FROM sized
      ), dup AS (
        SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2
      ), kept AS (
        SELECT s.doc_id, s.pos, s.seg FROM segs s
        WHERE NOT EXISTS (SELECT 1 FROM dup d WHERE d.seg = s.seg)
      ), cleaned AS (
        SELECT doc_id, count(*) AS n_kept,
          string_agg(seg, ' ' ORDER BY pos) AS cleaned
        FROM kept GROUP BY doc_id
      ), totals AS (
        SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id
      )
      SELECT t.doc_id, t.n_segs,
        coalesce(c.n_kept, 0) AS n_kept,
        length(coalesce(c.cleaned, '')) AS cleaned_chars,
        substr(coalesce(c.cleaned, ''), 1, 40) AS sample
      FROM totals t LEFT JOIN cleaned c USING (doc_id)
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  /** L2i: SUBSTRING-LEVEL EXACT DEDUP at arbitrary boundaries (r13
    * verdict "missing #3" — the Lee-et-al suffix-array shape, done
    * Spark-first): flag every token a document shares with ANOTHER
    * document as part of a run of ≥ K=20 contiguous tokens, wherever
    * in each document the run sits. The key identity that replaces the
    * suffix array: two documents share a ≥K-token run IFF they share
    * at least one exact K-gram, and a token is inside a shared run IFF
    * it is inside a shared K-gram window. So the pipeline is
    *   (1) slide a stride-1 K-gram window over every document
    *       (xxhash64 of the window — the l2h precedent),
    *   (2) CENSUS: window-hash → distinct-doc count ≥ 2 = shared
    *       (one shuffle keyed by hash, never all-pairs — at 100 TB
    *       this is the same census shape as l2h/l1),
    *   (3) semi-join shared hashes back, then per-document
    *       gaps-and-islands over window positions (windows ≤ K apart
    *       merge) → covered-token runs, coverage, longest run.
    * Arbitrary-boundary proof is built in: boilerplate is injected at
    * the HEAD of every 3rd doc and the TAIL of every 5th, so the same
    * run sits at different offsets in different documents and no fixed
    * segmentation (l2h's shape) could align it. Oracle: the identical
    * census + islands in DuckDB over the raw window strings —
    * brute-force exact ground truth, the l2g pattern. */
  val l2iSubstringDedup = QueryDef(
    "l2i_substring_dedup",
    (s, d) => {
      val K = 20
      val head30 = "this content is provided by the network syndication service and may not " +
        "be reproduced rebroadcast rewritten or redistributed in any form without prior " +
        "express written permission of the publisher"
      val tail26 = "for questions about licensing or reuse of this material please contact " +
        "the editorial desk through the usual channels listed on the corporate information " +
        "page online today"
      val docs = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(lit(head30), lit(" "), col("text")))
            .when(col("doc_id") % 5 === 0, concat(col("text"), lit(" "), lit(tail26)))
            .otherwise(col("text")).as("text"))
      val toks = docs.withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n_tokens"))
      val wins = toks.filter(col("n_tokens") >= K)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), (size(col("toks")) - K).cast("int")),
          i => xxhash64(array_join(slice(col("toks"), i + 1, lit(K)), " "))))
          .as(Seq("pos", "wh")))
      val shared = wins.groupBy("wh")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select("wh")
      val sw = wins.join(shared, Seq("wh"), "left_semi")
      val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      val runs = sw
        .withColumn("prev", lag(col("pos"), 1).over(byDoc))
        .withColumn("brk",
          when(col("prev").isNull || col("pos") - col("prev") > K, 1).otherwise(0))
        .withColumn("island", sum(col("brk")).over(byDoc))
        .groupBy(col("doc_id"), col("island"))
        .agg((max(col("pos")) - min(col("pos")) + K).cast("long").as("run_len"))
      val perDoc = runs.groupBy("doc_id").agg(
        count(lit(1)).as("n_runs"),
        sum(col("run_len")).as("dup_tokens"),
        max(col("run_len")).as("max_run"))
      toks.select("doc_id", "n_tokens")
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_runs"), lit(0L)).as("n_runs"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          coalesce(col("max_run"), lit(0L)).as("max_run"))
        .orderBy("doc_id")
    },
    Some("""
      WITH docs AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN concat('this content is provided by the network syndication service and may not be reproduced rebroadcast rewritten or redistributed in any form without prior express written permission of the publisher', ' ', text)
               WHEN doc_id % 5 = 0 THEN concat(text, ' ', 'for questions about licensing or reuse of this material please contact the editorial desk through the usual channels listed on the corporate information page online today')
               ELSE text END AS text
        FROM documents WHERE text IS NOT NULL
      ), toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM docs
      ), wins AS (
        SELECT doc_id,
          unnest(generate_series(0, len(t) - 20)) AS pos,
          unnest(list_transform(generate_series(0, len(t) - 20),
                 i -> array_to_string(t[(i+1):(i+20)], ' '))) AS w
        FROM toks WHERE n_tokens >= 20
      ), shared AS (
        SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2
      ), sw AS (
        SELECT doc_id, pos FROM wins WHERE w IN (SELECT w FROM shared)
      ), brks AS (
        SELECT doc_id, pos,
          CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                 OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
               THEN 1 ELSE 0 END AS brk
        FROM sw
      ), isl AS (
        SELECT doc_id, pos,
          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM brks
      ), runs AS (
        SELECT doc_id, island,
          CAST(max(pos) - min(pos) + 20 AS BIGINT) AS run_len
        FROM isl GROUP BY doc_id, island
      ), per AS (
        SELECT doc_id, count(*) AS n_runs,
          CAST(sum(run_len) AS BIGINT) AS dup_tokens,
          max(run_len) AS max_run
        FROM runs GROUP BY doc_id
      )
      SELECT t.doc_id, t.n_tokens,
        coalesce(p.n_runs, 0) AS n_runs,
        coalesce(p.dup_tokens, 0) AS dup_tokens,
        coalesce(p.max_run, 0) AS max_run
      FROM toks t LEFT JOIN per p USING (doc_id)
      ORDER BY t.doc_id
    """.stripMargin.trim),
  )

  /** L2j (r15): HAMMING-RADIUS near-dup pairs with a PIGEONHOLE-EXACT
    * banding plan — the rare LSH whose recall is 1.0 by construction,
    * so the DuckDB brute-force all-pairs scan is a true oracle, not a
    * ground-truth grader. 60-bit SimHash fingerprints are derived from
    * `md5(word)` nibbles (the one hash both engines share bit-for-bit;
    * Spark's murmur3 `hash()` is why l2b is rows-only), and candidate
    * pairs come from 4 bands of 15 bits: two signatures within Hamming
    * distance 3 differ in at most 3 bands, so AT LEAST ONE band matches
    * exactly — the band-equality self-join finds EVERY qualifying pair
    * while never comparing signatures across different buckets. At
    * 100 TB the plan is: one tokenize+aggregate pass (60 integer sums
    * per doc), one shuffle on (band, value), exact `bit_count(xor)`
    * only inside buckets — the corpus×corpus product never exists. */
  val l2jHammingRadius = QueryDef(
    "l2j_hamming_radius",
    (s, d) => {
      val Bits = 60
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .withColumn("h", md5(col("word")))
      val bitCols = (0 until Bits).map { b =>
        val nib = expr(s"instr('0123456789abcdef', substring(h, ${b / 4 + 1}, 1)) - 1")
        sum(when(shiftright(nib, b % 4).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
      }
      val sums = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      val sigCol = (0 until Bits)
        .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      val sig = sums.select(col("doc_id"), sigCol.as("sig"))
      val bandStructs = (0 until 4)
        .map(i => s"struct($i AS band, (sig div ${1L << (15 * i)}) % 32768 AS bv)")
        .mkString("array(", ", ", ")")
      val bands = sig
        .select(col("doc_id"), col("sig"), explode(expr(bandStructs)).as("b"))
        .select(col("doc_id"), col("sig"), col("b.band").as("band"), col("b.bv").as("bv"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.sig").as("sa"), col("y.sig").as("sb"))
        .distinct()
      cand
        .withColumn("dist", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
        .filter(col("dist") <= 3)
        .select(col("doc_a"), col("doc_b"), col("dist"))
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val sumCols = (0 until 60).map { b =>
        s"sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, ${b / 4 + 1}, 1)) - 1) // ${1 << (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS s$b"
      }.mkString(",\n          ")
      val sigExpr = (0 until 60)
        .map(b => s"CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH tok AS (
        SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents
      ),
      sums AS (
        SELECT doc_id,
          $sumCols
        FROM tok GROUP BY doc_id
      ),
      sig AS (SELECT doc_id, $sigExpr AS sig FROM sums)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS dist
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sig, b.sig)) <= 3
      ORDER BY doc_a, doc_b
      """.trim
    },
  )

  def defs: Seq[QueryDef] = Seq(l1Exact, l1Sha, l2MinHash, l2bSimHash, l2cNgramJaccard,
    l2fClusters, l2gIncremental, l2hSegmentDedup, l2iSubstringDedup, l2jHammingRadius)
}

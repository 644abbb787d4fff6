package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup family semantics on synthetic corpora with planted duplicates. */
class DedupSpec extends GraftSuite {
  import spark.implicits._

  // 0/1: near-identical (one token edit); 2: permutation of 0's tokens;
  // 3: exact copy of 0; 4/5: unrelated.
  private lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1L, "the quick brown fox jumps over the lazy cat near the old river bank today"),
    (2L, "today bank river old the near dog lazy the over jumps fox brown quick the"),
    (3L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (4L, "completely different content about spark query engines and columnar execution"),
    (5L, "yet another unrelated document mentioning shuffles partitions and broadcasts")
  ).toDF("doc_id", "text").cache()

  test("exactByText collapses exact copies to min doc_id") {
    val r = Dedup.exactByText(corpus).orderBy("keep_id").collect()
    assert(r.length === 5) // 0 and 3 merge
    assert(r.head.getLong(0) === 0L && r.head.getLong(1) === 2L)
  }

  test("fingerprintGroups collapses permutations and copies") {
    val groups = Dedup.fingerprintGroups(corpus).filter(col("n_docs") > 1).collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("n_docs") === 3L) // 0, 2, 3 share the token set
    assert(groups.head.getAs[Long]("keep_id") === 0L)
  }

  test("minhash LSH finds the near-identical pair and the exact pair") {
    val pairs = Dedup.minhashNearDupPairs(corpus, 3, 8, 2, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // identical -> jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // one-word edit
  }

  test("ngram prefix-filter blocking finds every pair minhash finds (exact recall)") {
    val mh = Dedup.minhashNearDupPairs(corpus, 3, 8, 2, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ng = Dedup.ngramJaccardPairs(corpus, 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(ng))
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val sh = Dedup.simhash(corpus).as[(Long, Long)].collect().toMap
    assert(sh(0L) === sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(4L)))
  }

  test("simhashNearDupPairs surfaces the copy pair at hamming 0") {
    val pairs = Dedup.simhashNearDupPairs(corpus, 6)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 0L))
  }

  test("editDistanceNearDupPairs: one-char edit found with exact distance") {
    val pairs = Dedup.editDistanceNearDupPairs(corpus, 200, 20)
      .select("id_a", "id_b", "edit_dist").as[(Long, Long, Long)].collect().toSet
    // dog -> cat: 3 substitutions; the exact copy is distance 0. The permutation
    // (doc 2) is character-far even though token-set-identical — must be absent.
    assert(pairs.contains((0L, 1L, 3L)))
    assert(pairs.contains((0L, 3L, 0L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("containmentPairs: asymmetric paragraph-in-page detection Jaccard misses") {
    // 10: a short paragraph; 11: a long page CONTAINING it verbatim plus 3x
    // more unrelated text; 12: unrelated. Jaccard(10,11) is far below 0.8,
    // containment C(10,11) = 1.0 — only the asymmetric measure fires.
    val para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val page = "intro words before the body " + para +
      " then a very long tail of unrelated filler tokens continues here with" +
      " many more words about engines partitions shuffles and columnar scans"
    val docs = Seq((10L, para), (11L, page), (12L, "nothing shared at all in this one"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, 3, 0.8)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((10L, 11L)),
      s"only para-in-page must fire, got ${pairs.toSeq}")
    assert(pairs.head._3 === 10000L, "verbatim containment is exactly 100%")
    // The symmetric Jaccard join at the same threshold finds NOTHING here —
    // the gap this operator exists to close.
    assert(Dedup.ngramJaccardPairs(docs, 3, 0.8).count() === 0L)
    // And on the planted corpus: exact copies contain each other BOTH ways.
    val sym = Dedup.containmentPairs(corpus, 3, 0.9)
      .select("contained_id", "container_id").as[(Long, Long)].collect().toSet
    assert(sym.contains((0L, 3L)) && sym.contains((3L, 0L)))
  }

  test("containment blocking: an ultra-common shingle creates no candidate blowup") {
    // 40 docs share one verbatim phrase (an ultra-common shingle family,
    // df = 40 = corpus size) but are otherwise pairwise-disjoint, plus one
    // genuine para-in-page containment pair. Naive blocking on EVERY shared
    // shingle would enumerate all C(40,2) = 780 common-key pairs; the
    // rare-first prefix filter + container-side rank filter must keep the
    // candidate set proportional to genuine near-containments instead. The
    // bound pins the PPJoin-Lemma-1 hardening: the common shingles rank last
    // in every doc's df order, so they are never indexed as containee prefix
    // keys and survive the container filter only for near-total containment.
    val common = " shared boilerplate footer phrase appears everywhere verbatim"
    val bulk = (0 until 40).map { i =>
      (i.toLong, s"unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e " +
        s"unique${i}f unique${i}g unique${i}h unique${i}i unique${i}j" + common)
    }
    val para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (bulk ++ Seq(
      (100L, para),
      (101L, "intro words then " + para + " and a long unrelated tail of many" +
        " extra filler tokens about engines and partitions and shuffles")
    )).toDF("doc_id", "text")
    val cands = Dedup.containmentCandidates(docs, 3, 0.8)
      .as[(Long, Long)].collect().toSet
    // Bound: candidates stay two orders of magnitude under the common-key
    // quadratic (empirically just the genuine pair + a handful of prefix
    // coincidences; 40 is a safe deterministic ceiling at 780 naive pairs).
    assert(cands.size < 40, s"candidate blowup: ${cands.size} pairs")
    assert(cands.contains((100L, 101L)), "genuine containment candidate lost")
    // Recall is intact end to end: exactly the planted pair verifies.
    val pairs = Dedup.containmentPairs(docs, 3, 0.8)
      .select("contained_id", "container_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 101L)))
    assert(!pairs.exists(p => p._1 < 40L && p._2 < 40L),
      "no bulk-corpus pair may verify: bulk docs share only the footer")
  }

  test("erTrigramCandidates: complete vs all-pairs positives, df-capped buckets, dup pass") {
    // One big block (fixed coarse key, the q_entity_trigram shape): 30 names
    // sharing an ultra-common token (posting df = 30 > cap) plus planted
    // near-dups and exact dups with rare trigrams.
    val rows = ((0 until 30).map(i => (i.toLong, s"common boilerplate name unique$i")) ++ Seq(
      (100L, "zq special widget xx"), (101L, "zq special widget yy"), // near-dup pair
      (200L, "exact same thing"), (201L, "exact same thing"), (202L, "exact same thing")
    )).toDF("id", "nm")
      .withColumn("blk", lit(1))
      .withColumn("tri", expr(
        "array_distinct(transform(sequence(1, greatest(length(nm) - 2, 0))," +
          " i -> substring(nm, i, 3)))"))
    val cand = Dedup.erTrigramCandidates(rows, Seq("blk"), "id", "tri", dfCap = 10)
      .as[(Long, Long)].collect().toSet
    // Contract: every pair sharing >=1 SUB-CAP trigram is a candidate
    // (pairs sharing only over-cap trigrams are the deliberate recall
    // trade the exact-dup pass and the caller's fallback backstop).
    // Expected set computed independently: per-trigram df, then pairs
    // joined through sub-cap trigrams only.
    val local = rows.select(col("id"), col("tri"))
      .as[(Long, Seq[String])].collect()
    val dfCount = local.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length }
    val expected = (for {
      (a, ta) <- local; (b, tb) <- local if a < b
      if ta.toSet.intersect(tb.toSet).exists(t => dfCount(t) <= 10)
    } yield (a, b)).toSet
    assert(cand.contains((100L, 101L)) && cand.contains((200L, 201L)) &&
      cand.contains((200L, 202L)) && cand.contains((201L, 202L)))
    assert(expected.subsetOf(cand), s"lost: ${(expected -- cand).take(5)}")
    // The capped bucket bound holds: candidates among the 30-doc common
    // block are exactly the sub-cap-witnessed ones (empirically zero — their
    // shared trigrams all have df >= 11), never the C(30,2) = 435 the
    // over-cap posting would enumerate.
    assert(cand.filter(p => p._1 < 30L && p._2 < 30L) ===
      expected.filter(p => p._1 < 30L && p._2 < 30L),
      "over-cap posting enumerated pairs")
    // Exact-dup pass fires independent of df: make EVERY trigram of the dup
    // trio ultra-common by cloning its name across 20 extra unique ids —
    // postings all exceed the cap, yet the identical-set group still pairs.
    val rows2 = ((0 until 20).map(i => (300L + i, "exact same thing")) ++
      Seq((400L, "exact same thing")))
      .toDF("id", "nm").withColumn("blk", lit(1))
      .withColumn("tri", expr(
        "array_distinct(transform(sequence(1, greatest(length(nm) - 2, 0))," +
          " i -> substring(nm, i, 3)))"))
    val cand2 = Dedup.erTrigramCandidates(rows2, Seq("blk"), "id", "tri", dfCap = 10)
      .as[(Long, Long)].collect().toSet
    assert(cand2.size === 21 * 20 / 2, "dup group must pair completely under keepIds")
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = Dedup.exactByText(corpus)
    val renamed = once.select(col("keep_id").as("doc_id"), col("text_hash").as("text"))
    val twice = Dedup.exactByText(renamed)
    assert(twice.count() === once.count())
  }
}

package graft

import graft.operators.{Corpus, Dedup}
import org.apache.spark.sql.functions._

/**
 * Corpus-preparation operators: connected-components clustering over near-dup
 * pairs, deterministic hash split, and the end-to-end cleaning funnel.
 */
class CorpusSpec extends GraftSuite {
  import spark.implicits._

  test("connectedComponents labels every node with its component minimum") {
    // Components: {1,2,3} (path), {4,5}, {10..14} (a 5-chain, diameter 4 — needs
    // multiple propagation rounds), plus {20,21,22} as a triangle.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (4L, 5L), (13L, 14L), (12L, 13L), (11L, 12L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(labels === expected)
  }

  test("star contraction solves a 120-node chain in O(log n) rounds") {
    // Diameter 119: min-label propagation would need 119 rounds (its default 25
    // refuses); the large-star/small-star variant lands well inside 20.
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect()
    assert(labels.length === 120)
    assert(labels.map(_._2).toSet === Set(0L))
  }

  test("property: star contraction agrees with min-label propagation") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEdges = Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 30L); b <- Gen.chooseNum(0L, 30L)
    } yield (a, b))
    val prop = Prop.forAll(genEdges) { es =>
      val pairs = es.filter { case (a, b) => a != b }
      pairs.isEmpty || {
        val df = pairs.toDF("id_a", "id_b")
        val starRows = Dedup.connectedComponentsStar(df).as[(Long, Long)].collect()
        val label = Dedup.connectedComponents(df, maxIters = 40)
          .as[(Long, Long)].collect().toMap
        // Length check first: toMap would silently collapse a duplicate-id row
        // (the multi-parent failure mode of a wrong star fixed point).
        starRows.length == label.size && starRows.toMap == label
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("star contraction refuses to return unconverged labels") {
    // r15: the production label path (StandardLabels, leakageSafeSplit) now
    // rides star contraction — its nonconvergence must be as loud as
    // propagation's, never a silently-partial labeling.
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponentsStar(chain, maxIters = 1)
    }
    assert(e.getMessage.contains("converge"))
  }

  test("connectedComponents refuses to return unconverged labels") {
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIters = 2)
    }
    assert(e.getMessage.contains("converge"))
    // With enough rounds the 11-node chain collapses to one component.
    val ok = Dedup.connectedComponents(chain, maxIters = 15)
      .as[(Long, Long)].collect()
    assert(ok.map(_._2).toSet === Set(0L))
    assert(ok.length === 11)
  }

  test("hashSplit is total, deterministic, and stable under corpus growth") {
    val docs = Tables.documents(spark, sfTiny)
    val a = Corpus.hashSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Corpus.hashSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
    assert(a.values.toSet.subsetOf(Set("train", "valid", "test")))
    val n = a.size.toDouble
    val trainFrac = a.values.count(_ == "train") / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    // Growth stability: splitting HALF the corpus assigns every shared doc the
    // same way (randomSplit cannot promise this — hash-of-own-id can).
    val half = Corpus.hashSplit(docs.filter(col("doc_id") % 2 === 0), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(half.forall { case (id, s) => a(id) == s })
  }

  test("perGroupSample caps every group at k with a reproducible membership") {
    val docs = Tables.documents(spark, sfTiny)
    val s1 = Corpus.perGroupSample(docs, "source", "doc_id", 5)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    val s2 = Corpus.perGroupSample(docs, "source", "doc_id", 5)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(s1 === s2)
    val perGroup = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perGroup.values.forall(_ <= 5))
    val groupSizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    // Groups with >= 5 docs yield exactly 5; smaller groups yield all their docs.
    perGroup.foreach { case (g, n) => assert(n === math.min(5L, groupSizes(g))) }
  }

  test("stratifiedSample: per-stratum rates, absent strata drop, membership growth-stable") {
    val docs = Tables.documents(spark, sfTiny)
    val fr = Map("en" -> 2500, "fr" -> 5000, "es" -> 1000, "zh" -> 7500)
    val s1 = Corpus.stratifiedSample(docs, "lang", "doc_id", fr)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(s1 === Corpus.stratifiedSample(docs, "lang", "doc_id", fr)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet)
    // A stratum missing from the plan keeps nothing.
    assert(!s1.exists(_._1 == "de"))
    // Rates land near their basis points (loose bands — small corpus).
    val tot = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    fr.foreach { case (lang, bp) =>
      val kept = s1.count(_._1 == lang).toDouble / tot(lang)
      assert(math.abs(kept - bp / 10000.0) < 0.15, s"$lang kept $kept vs ${bp / 10000.0}")
    }
    // Growth stability: sampling half the corpus keeps exactly the shared members
    // (the property randomSplit/sample cannot promise; hash-of-own-id can).
    val half = Corpus.stratifiedSample(
        docs.filter(col("doc_id") % 2 === 0), "lang", "doc_id", fr)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(half === s1.filter(_._2 % 2 == 0))
  }

  test("packSequences lays out docs contiguously and splits across bin boundaries") {
    // One shard (nShards=1), seqLen=10; token counts 4, 4, 5, 9:
    //   doc 0: cum 4  -> bin 0 off 0..3
    //   doc 1: cum 8  -> bin 0 off 4..7
    //   doc 2: cum 13 -> starts bin 0 off 8, SPANS into bin 1 (ends at cum-1=12)
    //   doc 3: cum 22 -> starts bin 1 off 3, ends bin 2
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((0L, doc(4)), (1L, doc(4)), (2L, doc(5)), (3L, doc(9)))
      .toDF("doc_id", "text")
    val packed = Corpus.packSequences(docs, 10, 1)
      .select("doc_id", "bin_start", "off_start", "bin_end")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq === Seq(
      (0L, 0L, 0L, 0L), (1L, 0L, 4L, 0L), (2L, 0L, 8L, 1L), (3L, 1L, 3L, 2L)))
    // Conservation: total tokens == last cum; every offset < seqLen.
    assert(packed.forall(_._3 < 10))
  }

  test("scd2 builds per-key version chains with exactly one current row") {
    import graft.operators.Relational
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val changes = Seq(
      ("a", ts("2024-01-01 00:00:00")), ("a", ts("2024-01-02 00:00:00")),
      ("a", ts("2024-01-03 00:00:00")), ("b", ts("2024-01-01 12:00:00")))
      .toDF("k", "ts")
    val hist = Relational.scd2(changes, Seq("k"), "ts")
    assert(hist.filter(col("is_current")).count() === 2) // one per key
    val aChain = hist.filter(col("k") === "a").orderBy("version")
      .select("version", "valid_to").collect()
    assert(aChain.length === 3)
    // Interval chaining: version v's valid_to == version v+1's valid_from.
    val a = hist.filter(col("k") === "a").orderBy("version")
      .select("valid_from", "valid_to").as[(Timestamp, Option[Timestamp])].collect()
    assert(a(0)._2.contains(a(1)._1) && a(1)._2.contains(a(2)._1) && a(2)._2.isEmpty)
  }

  test("chunkDocs: windows tile the doc with the given stride and reach the last token") {
    // 10 tokens, chunk 4, stride 3: chunks at 0,3,6 — nChunks = ceil((10-4)/3)+1 = 3;
    // the final chunk is the full 4 wide (6+4 = 10 = n).
    val docs = Seq((1L, (0 until 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Corpus.chunkDocs(docs, chunkSize = 4, stride = 3)
      .select("chunk_idx", "tok_start", "n_tok_chunk")
      .as[(Long, Long, Long)].collect().sorted
    assert(rows === Array((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L)))
    // A doc shorter than one chunk yields exactly one full-width window of itself.
    val short = Seq((2L, "a b")).toDF("doc_id", "text")
    val one = Corpus.chunkDocs(short, 4, 3)
      .select("chunk_idx", "tok_start", "n_tok_chunk").as[(Long, Long, Long)].collect()
    assert(one === Array((0L, 0L, 2L)))
  }

  test("stripFrequentSpans keeps the owner's copy and strips later docs' spans") {
    // Docs 1 and 2 share the 5-gram "p q r s t"; doc 1 (min id) owns it and stays
    // intact; doc 2 loses exactly those 5 tokens; doc 3 is untouched.
    val docs = Seq(
      (1L, "p q r s t u v"),
      (2L, "x y p q r s t z"),
      (3L, "m n o m n o m n")).toDF("doc_id", "text")
    val out = Corpus.stripFrequentSpans(docs, n = 5, minDf = 2)
      .select("doc_id", "n_tok", "n_removed", "clean_md5")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Array((1L, 7L, 0L), (2L, 8L, 5L), (3L, 8L, 0L)))
    // Doc 2's cleaned text is its surviving tokens in order.
    val expectMd5 = spark.sql("select md5('x y z') as h").as[String].head()
    assert(out(1)._4 === expectMd5)
  }

  test("property: chunkDocs covers every token and respects the stride law") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.chooseNum(1, 120)
      c <- Gen.chooseNum(1, 40)
      s <- Gen.chooseNum(1, 40) if s <= c
    } yield (n, c, s)
    val prop = Prop.forAll(gen) { case (n, c, s) =>
      val docs = Seq((1L, (0 until n).map(i => s"w$i").mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = Corpus.chunkDocs(docs, c, s)
        .select("chunk_idx", "tok_start", "n_tok_chunk")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val starts = chunks.map(_._2)
      val coveredAll = chunks.flatMap(ch => ch._2 until (ch._2 + ch._3)).toSet ==
        (0L until n.toLong).toSet
      val strideLaw = starts.sameElements(chunks.indices.map(_.toLong * s))
      val widths = chunks.forall(ch => ch._3 == math.min(c.toLong, n - ch._2))
      val lastReaches = chunks.last._2 + chunks.last._3 == n.toLong
      coveredAll && strideLaw && widths && lastReaches
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("stripFrequentSpans: overlapping frequent grams never destroy the owner's copy") {
    // Gram "a b c d e" is owned by doc 1; gram "b c d e f" is owned by doc 2 and
    // OVERLAPS doc 2's removable copy of the first gram. Without owner protection,
    // removing positions 0-4 from doc 2 would destroy its owned "b c d e f" span,
    // leaving zero surviving copies corpus-wide.
    val docs = Seq(
      (1L, "x1 a b c d e"),
      (2L, "a b c d e f"),
      (3L, "b c d e f y")).toDF("doc_id", "text")
    val out = Corpus.stripFrequentSpans(docs, n = 5, minDf = 2)
      .select("doc_id", "n_removed", "clean_md5")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    def h(s: String) = spark.sql(s"select md5('$s') as h").as[String].head()
    // Doc 1 intact; doc 2 loses only position 0 ("a"), keeping its owned span;
    // doc 3 loses its non-owned copy of "b c d e f" entirely.
    assert(out === Array(
      (1L, 0L, h("x1 a b c d e")),
      (2L, 1L, h("b c d e f")),
      (3L, 5L, h("y"))))
  }

  test("mixWeights: integer basis-point shares and uniform-rebalance repeat factors") {
    // Two sources, 300 vs 100 tokens: shares 7500/2500 bp; uniform target is 200
    // each, so repeat factors are 200/300 = 6666 bp and 200/100 = 20000 bp.
    val docs = Seq(
      (1L, "s1", (1 to 300).map(_ => "t").mkString(" ")),
      (2L, "s2", (1 to 100).map(_ => "t").mkString(" "))).toDF("doc_id", "source", "text")
    val out = Corpus.mixWeights(docs)
      .select("source", "n_tokens", "share_bp", "repeat_bp", "tokens_after")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      ("s1", 300L, 7500L, 6666L, 199L),
      ("s2", 100L, 2500L, 20000L, 200L)))
  }

  test("modelQualityScore: exact, order-independent, non-degenerate gate") {
    val docs = Tables.documents(spark, sfTiny)
    val s1 = Corpus.modelQualityScore(docs)
      .select("doc_id", "score", "keep").as[(Long, Long, Boolean)].collect()
    // Deterministic across runs AND partition layouts (integer sums).
    val s2 = Corpus.modelQualityScore(docs.repartition(13))
      .select("doc_id", "score", "keep").as[(Long, Long, Boolean)].collect()
    assert(s1.toSet === s2.toSet)
    // The gate discriminates: both classes exist, and keep == (score >= 0).
    assert(s1.exists(_._3) && s1.exists(!_._3))
    assert(s1.forall(r => r._3 == (r._2 >= 0L)))
    // Scoring a doc ignores every other doc: a singleton scores identically.
    val one = docs.orderBy("doc_id").limit(1)
    val solo = Corpus.modelQualityScore(one)
      .select("doc_id", "score").as[(Long, Long)].collect().head
    assert(s1.find(_._1 == solo._1).get._2 === solo._2)
  }

  test("mixWeightsTemperature: flattens the head, upweights the tail, conserves mass") {
    val w = Corpus.mixWeightsTemperature(Tables.documents(spark, sfTiny))
      .select("source", "share_bp", "temp_bp", "upweighted")
      .as[(String, Long, Long, Boolean)].collect()
    // Temperature-2 scaling compresses the share distribution: the largest
    // source loses share, the smallest gains (strictly, unless degenerate).
    val maxSrc = w.maxBy(_._2); val minSrc = w.minBy(_._2)
    assert(maxSrc._3 < maxSrc._2, s"head must flatten: $maxSrc")
    assert(minSrc._3 > minSrc._2, s"tail must upweight: $minSrc")
    assert(w.forall(r => r._4 == (r._3 > r._2)))
    // Both plans distribute ~the whole budget (floor loses < #sources bp).
    assert(math.abs(w.map(_._2).sum - 10000L) < w.length)
    assert(math.abs(w.map(_._3).sum - 10000L) < w.length)
    // Rank order is preserved: scaling is monotone in share.
    val byShare = w.sortBy(_._2).map(_._1).toSeq
    val byTemp = w.sortBy(r => (r._3, r._2)).map(_._1).toSeq
    assert(byShare === byTemp)
  }

  test("materializeMix applies whole copies exactly and fractions by stable hash") {
    // Same 300/100-token fixture as mixWeights: s1 repeats at 6666 bp (0 whole
    // copies — the single doc survives iff its hash lands under 6666/10000),
    // s2 at 20000 bp (exactly 2 whole copies, fraction 0 — never a third).
    val docs = Seq(
      (1L, "s1", (1 to 300).map(_ => "t").mkString(" ")),
      (2L, "s2", (1 to 100).map(_ => "t").mkString(" "))).toDF("doc_id", "source", "text")
    val out = Corpus.materializeMix(docs)
      .select("doc_id", "copy_idx").as[(Long, Long)].collect().sorted
    val s2Copies = out.filter(_._1 == 2L).map(_._2)
    assert(s2Copies === Array(1L, 2L), "20000 bp must yield exactly 2 copies")
    val s1Copies = out.filter(_._1 == 1L)
    assert(s1Copies.length <= 1, "6666 bp can never yield more than 1 copy")
    // Determinism: a second evaluation reproduces the same membership.
    val again = Corpus.materializeMix(docs)
      .select("doc_id", "copy_idx").as[(Long, Long)].collect().sorted
    assert(again === out)
    // Epoch cap: a 1-token source in a 3000-token mix asks for a huge repeat
    // factor; the cap must clamp it (here to 3 copies), not materialize it.
    val skewed = Seq(
      (1L, "big", (1 to 3000).map(_ => "t").mkString(" ")),
      (2L, "rare", "t")).toDF("doc_id", "source", "text")
    val capped = Corpus.materializeMix(skewed, maxRepeatBp = 30000L)
      .filter(col("doc_id") === 2L).count()
    assert(capped === 3L, s"cap must clamp the rare source, got $capped copies")
  }

  test("leakageSafeSplit: clusters never straddle splits; singletons keep per-doc split") {
    val docs = Tables.documents(spark, sfTiny)
    val pairs = Dedup.minhashNearDupPairs(docs, 3, 8, 2, 0.8)
    assert(pairs.count() > 0, "fixture must contain planted near-dup pairs")
    val out = Corpus.leakageSafeSplit(docs, pairs)
      .select("doc_id", "group_id", "split").as[(Long, Long, String)].collect()
    // Co-assignment: every group maps to exactly one split.
    val perGroup = out.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size)
    assert(perGroup.values.forall(_ === 1), "a cluster straddles a split boundary")
    // Singletons (group == own id, no pair membership) match the plain hash split.
    val paired = pairs.select("id_a").union(pairs.select("id_b"))
      .distinct().as[Long].collect().toSet
    val plain = Corpus.hashSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.filter(r => !paired.contains(r._1)).foreach { case (id, g, s) =>
      assert(g === id && s === plain(id), s"singleton $id moved: $s vs ${plain(id)}")
    }
  }

  test("heavyHittersAudited: exact top-k ranks, CMS guarantees hold on planted skew") {
    // 60 docs: "hot" appears 3x/doc (180), "warm" 1x/doc (60), plus per-doc unique
    // noise terms - the classic heavy-hitter shape CMS is built for.
    val docs = (1 to 60).map { i =>
      (i.toLong, "s", s"hot hot hot warm noise$i")
    }.toDF("doc_id", "source", "text")
    val out = Corpus.heavyHittersAudited(docs, k = 2)
      .as[(String, Long, Boolean, Boolean)].collect()
      .sortBy { case (t, c, _, _) => (-c, t) }
    assert(out.map(r => (r._1, r._2)) === Array(("hot", 180L), ("warm", 60L)))
    assert(out.forall(_._3), "CMS must never underestimate")
    assert(out.forall(_._4), "estimates must sit inside the eps*N bound")
  }

  test("iterative ops switch to reliable checkpoints when a checkpoint dir is set") {
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("reliable-ckpt")
    // setCheckpointDir has no unset API; reliable checkpoints stay on for the
    // rest of this JVM, which only changes durability (still correct everywhere).
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(dir)).nonEmpty,
      "rounds must have checkpointed into the reliable dir")
  }

  test("integer pagerank: authority concentrates, symmetric nodes tie exactly") {
    import graft.operators.Graphs
    // a -> c, b -> c, c -> a: c is the authority; a and b are symmetric sources
    // (a additionally receives c's mass, so a > b).
    val edges = Seq(("a", "c", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "weight")
    val r1 = Graphs.pagerank(edges, 3).as[(String, Long)].collect().toMap
    val r2 = Graphs.pagerank(edges, 3).as[(String, Long)].collect().toMap
    assert(r1 === r2, "integer fixed-point must be bit-identical across runs")
    assert(r1("c") > r1("a") && r1("a") > r1("b"),
      s"authority ordering c > a > b expected: $r1")
    // Weighted edges shift mass proportionally.
    val weighted = Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("src", "dst", "weight")
    val rw = Graphs.pagerank(weighted, 2).as[(String, Long)].collect().toMap
    assert(rw("b") > rw("c"))
  }

  test("bfsLevels: chain distances, depth bound, disconnected node absent") {
    import graft.operators.Graphs
    // Chain a-b-c-d-e plus isolated pair x-y. From 'a': distances 0..4; x,y absent.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"))
      .toDF("a", "b")
    val lv = Graphs.bfsLevels(edges, lit("a"), 8).as[(String, Long)].collect().toMap
    assert(lv === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "e" -> 4L))
    // Depth 2 truncates the frontier: d and e not yet reached.
    val lv2 = Graphs.bfsLevels(edges, lit("a"), 2).as[(String, Long)].collect().toMap
    assert(lv2 === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    // A self-loop-only node must not enter the node set (it would otherwise
    // stay unreached forever and defeat the full-reach early exit).
    val loops = Seq(("a", "b"), ("z", "z")).toDF("a", "b")
    val lv3 = Graphs.bfsLevels(loops, lit("a"), 4).as[(String, Long)].collect().toMap
    assert(lv3 === Map("a" -> 0L, "b" -> 1L))
    // An EDGELESS source (not an endpoint of any non-loop edge) is still
    // within 0 hops of itself: exactly its level-0 row comes back, and the
    // all-null early exit fires instead of burning maxDepth empty rounds.
    val lv4 = Graphs.bfsLevels(edges, lit("q"), 8).as[(String, Long)].collect().toMap
    assert(lv4 === Map("q" -> 0L))
    // A loop-only source likewise (its loops are filtered, leaving no edges).
    val lv5 = Graphs.bfsLevels(loops, lit("z"), 4).as[(String, Long)].collect().toMap
    assert(lv5 === Map("z" -> 0L))
  }

  test("triangleCounts: K4 plus a pendant edge, duplicates and loops ignored") {
    import graft.operators.Graphs
    // K4 on {a,b,c,d} = 4 triangles, each node in exactly 3. Pendant e-a joins no
    // triangle; duplicate/reversed/self edges must not inflate counts.
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("b", "a"), ("a", "b"),            // duplicates in both orientations
      ("a", "a"),                        // self loop
      ("e", "a")                         // pendant
    ).toDF("a", "b")
    val tri = Graphs.triangleCounts(edges).as[(String, Long)].collect().toMap
    assert(tri === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("ruleFlags: each rule fires on its designed failure mode") {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over a lazy dog near the river bank today"),
      (2L, "en", "too short"),                                        // fails r_len
      (3L, "en", ("spam " * 20).trim),                                // fails r_rep (1 distinct 3-gram)
      (4L, "en", "quick brown fox jumps over lazy dog near river bank today again soon"),
      (5L, "en", "the " + Seq.fill(12)("pneumonoultramicroscopicsilicovolcanoconiosis").mkString(" "))
    ).toDF("doc_id", "lang", "text")                                  // 5: fails r_wordlen
    val flags = Corpus.ruleFlags(docs)
      .select("doc_id", "r_len", "r_wordlen", "r_stop", "r_rep", "r_pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(flags(1L)._6, "doc 1 passes everything")
    assert(!flags(2L)._2 && !flags(2L)._6, "short doc fails r_len")
    assert(!flags(3L)._5 && !flags(3L)._6, "repeated token fails r_rep")
    assert(!flags(4L)._4 && !flags(4L)._6, "no stopword fails r_stop")
    assert(!flags(5L)._3 && !flags(5L)._6, "long words fail r_wordlen")
  }

  test("decontaminate flags only docs sharing enough shingles with the benchmark") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"$shared plus unrelated trailing words here"), // 4 shared 5-grams
      (2L, "completely different text with no overlap at all whatsoever today"),
      (3L, "alpha beta gamma here but then it diverges entirely afterwards")
    ).toDF("doc_id", "text") // doc 3: no full 5-gram in common
    val bench = Seq((100L, s"$shared and its own continuation")).toDF("doc_id", "text")
    val hits = Corpus.decontaminate(corpus, bench, 5, 3,
      excludeSelfPairs = true)
      .select("doc_id", "bench_id", "n_shared").as[(Long, Long, Long)].collect()
    assert(hits.map(_._1).toSeq === Seq(1L))
    assert(hits.head._2 === 100L && hits.head._3 >= 3)
  }

  test("decontaminate excludeSelfPairs=true drops identity pairs; false reports them") {
    // A benchmark that IS a corpus slice: doc 1 appears on both sides under
    // the same id. excludeSelfPairs is REQUIRED (the default flipped twice
    // across releases — r11 and r13 — so it was removed): `true` (corpus-
    // slice benchmark) must drop the trivial doc==bench pair; `false`
    // (independent benchmark) must report it.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"$shared plus unrelated trailing words here"),
      (2L, "completely different text with no overlap at all whatsoever today")
    ).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 1L)
    val defaults = Corpus.decontaminate(corpus, bench,
      excludeSelfPairs = true)
      .select("doc_id", "bench_id").as[(Long, Long)].collect()
    assert(!defaults.contains((1L, 1L)),
      s"excludeSelfPairs=true must drop the self-pair, got ${defaults.toSeq}")
    val optOut = Corpus.decontaminate(corpus, bench, 5, 3,
      excludeSelfPairs = false)
      .select("doc_id", "bench_id").as[(Long, Long)].collect()
    assert(optOut.contains((1L, 1L)),
      s"opt-out must report the id-colliding pair, got ${optOut.toSeq}")
  }

  test("unigramLogLoss ranks rare-token docs as less corpus-like") {
    val docs = Seq(
      (1L, "common common common common common"),
      (2L, "rareword otherrare thirdrare fourthrare fifthrare"))
      .toDF("doc_id", "text")
    val nll = Corpus.unigramLogLoss(docs)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(nll(2L) > nll(1L), s"rare tokens must score higher NLL: $nll")
  }

  test("cleanFunnel stages are monotone and start from the full corpus") {
    val docs = Tables.documents(spark, sfTiny)
    val stages = Corpus.cleanFunnel(docs)
      .select("stage", "n_docs", "n_tokens").as[(String, Long, Long)].collect()
    assert(stages.map(_._1).toSeq ===
      Seq("raw", "quality", "lang_en", "exact_dedup", "neardup_fp"))
    assert(stages.head._2 === docs.count())
    val counts = stages.map(_._2)
    assert(counts.zip(counts.tail).forall { case (prev, next) => next <= prev },
      s"funnel must be monotone: ${counts.toSeq}")
    assert(stages.last._2 > 0, "the funnel must not empty the corpus")
    val tokens = stages.map(_._3)
    assert(tokens.zip(tokens.tail).forall { case (p, nx) => nx <= p })
  }

  test("repetitionSignals: top shares, single-token and uniform docs") {
    val docs = Seq(
      (1L, "solo"),                      // no bigrams: c_top_bigram 0, flags false
      (2L, "x x x x x"),                 // uniform: word share 100%, bigram 100%
      (3L, "a b c d e f g h i j")        // all distinct: shares 10% / ~11%
    ).toDF("doc_id", "text")
    val rows = Corpus.repetitionSignals(docs)
      .select("doc_id", "n_tok", "c_top_word", "c_top_bigram", "flag_word", "flag_bigram")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L) === ((1L, 1L, 1L, 0L, true, false)))  // 5*1 > 1: one token IS >20%
    assert(rows(2L) === ((2L, 5L, 5L, 4L, true, true)))
    assert(rows(3L) === ((3L, 10L, 1L, 1L, false, false)))
  }

  test("wordEntropy: uniform doc scores 0, diverse doc scores ln(n)") {
    val docs = Seq(
      (1L, "x x x x"),                   // one word: H = 0 exactly
      (2L, "a b c d")                    // 4 uniform words: H = ln(4)
    ).toDF("doc_id", "text")
    val rows = Corpus.wordEntropy(docs)
      .select("doc_id", "n_uniq", "entropy_scaled").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows(1L) === ((1L, 0L)))
    // 4 terms of floor(1e6 * 1 * ln(4) / 4) = floor(346573.59) = 346573
    assert(rows(2L) === ((4L, 4L * 346573L)))
  }

  test("scrubPii redacts all three pattern families and respects boundaries") {
    val docs = Seq(
      (1L, "mail u7@mail.com from 10.7.0.49 call 555-123-0007 end"),
      // Boundary cases that must NOT match: 4-digit octet runs, over-long phone.
      (2L, "clean 1234.5.6.7890 or 5555-123-00071 text")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), Corpus.scrubPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "mail <EMAIL> from <IP> call <PHONE> end")
    assert(out(2L) === "clean 1234.5.6.7890 or 5555-123-00071 text")
  }
}

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
}

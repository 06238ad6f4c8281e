package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def docs = {
    import spark.implicits._
    (0 until 400).map { i =>
      (i.toLong, if (i % 3 == 0) "en" else "fr", s"doc text number ${i % 250}",
        (i % 97) + 1)
    }.toDF("doc_id", "lang", "text", "w")
  }

  // ---------------------------------------------------------- KMV

  test("KMV merge of split sketches equals the whole-corpus sketch exactly") {
    val whole = Sketches.kmvSketch(docs, "text", 64)
    val parts = Sketches.kmvSketch(docs.where(F.col("doc_id") % 3 === 0),
        "text", 64)
      .unionByName(Sketches.kmvSketch(
        docs.where(F.col("doc_id") % 3 === 1), "text", 64))
      .unionByName(Sketches.kmvSketch(
        docs.where(F.col("doc_id") % 3 === 2), "text", 64))
    val merged = Sketches.mergeKmvSketches(parts)
    assert(merged.collect().toSeq == whole.collect().toSeq)
  }

  test("KMV grouped merge equals the whole-corpus grouped sketch") {
    val whole = Sketches.kmvSketch(docs, "text", 16, groupCol = Some("lang"))
      .orderBy("lang")
    val merged = Sketches.mergeKmvSketchesByGroup(
      Sketches.kmvSketch(docs.where(F.col("doc_id") % 2 === 0), "text", 16,
          groupCol = Some("lang"))
        .unionByName(Sketches.kmvSketch(
          docs.where(F.col("doc_id") % 2 === 1), "text", 16,
          groupCol = Some("lang"))),
      "lang").orderBy("lang")
    assert(merged.collect().toSeq == whole.collect().toSeq)
  }

  test("KMV estimate is exact below k and within 25% above k here") {
    // 250 distinct texts; k = 512 > 250 -> exact count
    val exact = Sketches.kmvEstimate(Sketches.kmvSketch(docs, "text", 512))
      .collect().head
    assert(exact.getLong(0) == 250L)
    assert(exact.getDouble(1) == 250.0)
    // k = 64 < 250 -> estimator; md5 uniformity keeps it in the ballpark
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(docs, "text", 64))
      .collect().head.getDouble(1)
    assert(est > 250.0 * 0.75 && est < 250.0 * 1.25, s"estimate $est")
  }

  test("KMV merge refuses mismatched k stamps") {
    val a = Sketches.kmvSketch(docs, "text", 16)
    val b = Sketches.kmvSketch(docs, "text", 32)
    val ex = intercept[Exception] {
      Sketches.mergeKmvSketches(a.unionByName(b)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("KMV jaccard is 1 on identical sets and tracks real overlap") {
    val a = Sketches.kmvSketch(docs, "text", 64)
    val same = Sketches.kmvJaccard(a, a).collect().head
    assert(same.getAs[Double]("jaccard") == 1.0)
    // texts repeat mod 250, so doc_id < 250 holds ALL distinct texts and
    // doc_id >= 250 holds a 150-text subset: true J = 150/250 = 0.6
    val full = Sketches.kmvSketch(docs.where(F.col("doc_id") < 250),
      "text", 64)
    val part = Sketches.kmvSketch(docs.where(F.col("doc_id") >= 250),
      "text", 64)
    val j = Sketches.kmvJaccard(full, part).collect().head
      .getAs[Double]("jaccard")
    assert(j > 0.35 && j < 0.85, s"jaccard $j")
  }

  test("KMV sample keys are the k md5-smallest distinct keys, with keys") {
    val sk = Sketches.kmvSketch(docs, "text", 8)
    val sample = Sketches.kmvSample(sk).collect()
    assert(sample.length == 8)
    val expect = docs.select(F.col("text")).distinct()
      .withColumn("h", F.md5(F.col("text")))
      .orderBy("h").limit(8)
      .select("h", "text").collect().map(r => (r.getString(0), r.getString(1)))
    assert(sample.map(r => (r.getString(0), r.getString(1))).toSeq
      == expect.toSeq)
  }

  // ---------------------------------------------------------- CMS

  test("CMS merge equals the whole-corpus sketch and never undercounts") {
    val whole = Sketches.cmsSketch(docs, "text", depth = 3, width = 64)
    val merged = Sketches.mergeCmsSketches(
      Sketches.cmsSketch(docs.where(F.col("doc_id") % 2 === 0), "text",
          depth = 3, width = 64)
        .unionByName(Sketches.cmsSketch(
          docs.where(F.col("doc_id") % 2 === 1), "text",
          depth = 3, width = 64)))
    assert(merged.orderBy("r").collect().toSeq
      == whole.orderBy("r").collect().toSeq)
    // every point estimate >= exact count (overestimate-only guarantee)
    val exact = docs.groupBy("text").agg(F.count(F.lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(merged, exact, "text")
    assert(est.where(F.col("estimate") < F.col("exact")).count() == 0)
    // total mass conserved per row
    assert(whole.select(F.col("n")).distinct().collect().map(_.getLong(0))
      .toSeq == Seq(400L))
  }

  test("cellsToCms rebuilds the exact sketch from sparse cells") {
    val whole = Sketches.cmsSketch(docs, "text", depth = 3, width = 64)
    // explode to sparse non-zero cells (the windowedCms emission shape)
    val cells = whole.select(F.col("r"),
        F.posexplode(F.col("counts")).as(Seq("b", "n")))
      .where(F.col("n") > 0)
    val rebuilt = Sketches.cellsToCms(cells, depth = 3, width = 64)
    assert(rebuilt.orderBy("r").collect().toSeq
      == whole.orderBy("r").collect().toSeq)
    // out-of-grid cells raise loudly
    import spark.implicits._
    val bad = Seq((0, 99L, 5L)).toDF("r", "b", "n")
    val ex = intercept[Exception] {
      Sketches.cellsToCms(bad, depth = 3, width = 64).collect()
    }
    assert(ex.getMessage != null)
  }

  test("CMS merge refuses mismatched (depth, width) stamps") {
    val a = Sketches.cmsSketch(docs, "text", depth = 3, width = 64)
    val b = Sketches.cmsSketch(docs, "text", depth = 3, width = 128)
    val ex = intercept[Exception] {
      Sketches.mergeCmsSketches(a.unionByName(b)).collect()
    }
    assert(ex.getMessage != null)
  }

  // ------------------------------------------------ weighted sample

  test("weighted sample is deterministic, sized k, and weight-sensitive") {
    val s1 = Sketches.weightedSample(docs, "doc_id", "w", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sketches.weightedSample(docs, "doc_id", "w", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.size == 20)
    // grouped: exactly k per group
    val g = Sketches.weightedSample(docs, "doc_id", "w", 5,
      groupCol = Some("lang"))
    val per = g.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("en" -> 5L, "fr" -> 5L))
    // weight sensitivity: mean weight of the sampled 20 clearly exceeds
    // the corpus mean (priorities scale with weight; md5 is data-blind)
    val sampledMean = docs.where(F.col("doc_id").isInCollection(s1))
      .agg(F.avg("w")).collect().head.getDouble(0)
    val corpusMean = docs.agg(F.avg("w")).collect().head.getDouble(0)
    assert(sampledMean > corpusMean, s"$sampledMean <= $corpusMean")
  }

  test("non-positive weights and null keys are excluded") {
    import spark.implicits._
    val df = Seq((Some(1L), 5.0), (Some(2L), 0.0), (Some(3L), -1.0),
      (None, 9.0), (Some(4L), 2.0)).toDF("id", "w")
    val got = Sketches.weightedSample(df, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }
}

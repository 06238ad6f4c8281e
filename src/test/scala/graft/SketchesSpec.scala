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

  // ---------------------------------------------------------- Bloom

  test("Bloom merge of split sketches equals the whole-corpus filter bit-exactly") {
    val (m, k) = (2048, 3)
    val whole = Sketches.bloomSketch(docs, "text", m, k)
    val merged = Sketches.mergeBloomSketches(
      Sketches.bloomSketch(docs.where(F.col("doc_id") % 2 === 0), "text", m, k)
        .unionByName(Sketches.bloomSketch(
          docs.where(F.col("doc_id") % 2 === 1), "text", m, k)))
    assert(merged.collect().toSeq == whole.collect().toSeq)
    // partitioning-invariant (the determinism claim)
    val re = Sketches.bloomSketch(docs.repartition(7), "text", m, k)
    assert(re.collect().toSeq == whole.collect().toSeq)
  }

  test("Bloom probe: no false negatives; false positives deterministic; fill estimate tracks n") {
    import spark.implicits._
    val (m, k) = (2048, 3)
    val sk = Sketches.bloomSketch(docs, "text", m, k)
    // every inserted key reads true — the one-sided guarantee
    val present = docs.select(F.col("text").as("probe")).distinct()
    assert(Sketches.bloomProbe(sk, present, "probe")
      .where(!F.col("member")).count() == 0)
    // absent probes answer the SAME member bit on every run/partitioning
    val absent = (0 until 500).map(i => s"never inserted $i").toDF("probe")
    val a1 = Sketches.bloomProbe(sk, absent, "probe")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val a2 = Sketches.bloomProbe(sk, absent.repartition(5), "probe")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(a1 == a2)
    // with 250 distinct keys in 2048 bits the fp rate should be modest
    val fp = a1.values.count(identity).toDouble / a1.size
    assert(fp < 0.25, s"false-positive rate $fp implausible for n=250 m=$m")
    // fill-ratio estimate lands near the true distinct count
    val est = Sketches.bloomEstimate(sk).collect().head.getAs[Double]("estimate")
    assert(math.abs(est - 250.0) / 250.0 < 0.15, s"estimate $est vs 250")
  }

  test("cellsToBloom rebuilds the exact filter from sparse words and range-checks") {
    import spark.implicits._
    val (m, k) = (1024, 4)
    val whole = Sketches.bloomSketch(docs, "text", m, k)
    val cells = whole.select(
        F.posexplode(F.col("words")).as(Seq("td_w", "td_bits")))
      .where(F.col("td_bits") =!= 0L)
    assert(Sketches.cellsToBloom(cells, m, k).collect().toSeq
      == whole.collect().toSeq)
    val badW = Seq((99, 1L)).toDF("td_w", "td_bits")
    val ex = intercept[Exception] {
      Sketches.cellsToBloom(badW, m, k).collect()
    }
    assert(ex.getMessage != null)
    val badBits = Seq((0, 4294967296L)).toDF("td_w", "td_bits")
    val ex2 = intercept[Exception] {
      Sketches.cellsToBloom(badBits, m, k).collect()
    }
    assert(ex2.getMessage != null)
  }

  test("scatter_long raises on positions outside int range instead of wrapping") {
    import spark.implicits._
    // 2^32 + 5 wrapped to cell 5 under the old intValue() truncation
    val corrupt = Seq((4294967301L, 7L)).toDF("p", "v")
    val ex = intercept[Exception] {
      corrupt.agg(graft.expressions.VecAggs.scatterLong(
        F.col("p"), F.col("v"), 16)).collect()
    }
    assert(ex.getMessage != null)
    // in-int-range positions outside [0, width) keep the documented ignore
    val ok = Seq((5L, 7L), (100L, 9L), (-3L, 11L)).toDF("p", "v")
      .agg(graft.expressions.VecAggs.scatterLong(
        F.col("p"), F.col("v"), 16).as("w"))
      .head().getSeq[Long](0)
    assert(ok(5) == 7L && ok.count(_ != 0L) == 1, ok.mkString(","))
  }

  test("fixed_vec_sum refuses a non-array<double> child at analysis time") {
    import spark.implicits._
    val floats = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("v")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      floats.agg(graft.expressions.PcaKernels.fixedVecSum(
        F.col("v"), 2, 64.0).as("s")).collect()
    }
    assert(ex.getMessage.contains("array<double>"), ex.getMessage)
  }

  test("Bloom merge refuses mismatched (m, k) stamps") {
    val a = Sketches.bloomSketch(docs, "text", 1024, 3)
    val b = Sketches.bloomSketch(docs, "text", 2048, 3)
    val ex = intercept[Exception] {
      Sketches.mergeBloomSketches(a.unionByName(b)).collect()
    }
    assert(ex.getMessage.contains("(m, k)"), ex.getMessage)
  }

  // ---------------------------------------------------------- KMV set ops

  test("KMV set ops track exact union/intersection/difference cardinalities") {
    import spark.implicits._
    // two overlapping key sets with known algebra: A = 0..599,
    // B = 400..999 → |A|=600 |B|=600 |A∪B|=1000 |A∩B|=200
    val a = (0 until 600).map(i => s"key $i").toDF("key")
    val b = (400 until 1000).map(i => s"key $i").toDF("key")
    val ops = Sketches.kmvSetOps(
      Sketches.kmvSketch(a, "key", 256), Sketches.kmvSketch(b, "key", 256))
      .collect().head
    val union = ops.getAs[Double]("union_est")
    val inter = ops.getAs[Double]("intersect_est")
    val dab = ops.getAs[Double]("diff_ab_est")
    val dba = ops.getAs[Double]("diff_ba_est")
    assert(math.abs(union - 1000.0) / 1000.0 < 0.2, s"union $union")
    assert(math.abs(inter - 200.0) / 200.0 < 0.4, s"intersect $inter")
    assert(math.abs(dab - 400.0) / 400.0 < 0.4, s"diff A\\B $dab")
    assert(math.abs(dba - 400.0) / 400.0 < 0.4, s"diff B\\A $dba")
    // containment |A∩B|/|A| ≈ 200/600
    val cab = ops.getAs[Double]("containment_ab")
    assert(math.abs(cab - 1.0 / 3.0) < 0.15, s"containment $cab")
    // jaccard consistent with the standalone estimator
    val j = Sketches.kmvJaccard(
        Sketches.kmvSketch(a, "key", 256), Sketches.kmvSketch(b, "key", 256))
      .collect().head.getAs[Double]("jaccard")
    assert(ops.getAs[Double]("jaccard") == j)
    // below-k exactness: tiny disjoint sets answer exact integers
    val tiny = Sketches.kmvSetOps(
      Sketches.kmvSketch((0 until 10).map(i => s"a$i").toDF("key"), "key", 256),
      Sketches.kmvSketch((0 until 5).map(i => s"b$i").toDF("key"), "key", 256))
      .collect().head
    assert(tiny.getAs[Double]("union_est") == 15.0)
    assert(tiny.getAs[Double]("intersect_est") == 0.0)
    assert(tiny.getAs[Double]("diff_ab_est") == 10.0)
    assert(tiny.getAs[Double]("diff_ba_est") == 5.0)
  }

  test("KMV set ops refuse mismatched k stamps") {
    val ex = intercept[Exception] {
      Sketches.kmvSetOps(
        Sketches.kmvSketch(docs, "text", 64),
        Sketches.kmvSketch(docs, "text", 128)).collect()
    }
    assert(ex.getMessage.contains("k stamps"), ex.getMessage)
  }

  test("mismatched k stamps raise even when the sketches share no hashes") {
    import spark.implicits._
    // disjoint key sets → disjoint md5 hash sets: a per-hash stamp guard
    // sees a single k in every group and would pass silently, producing
    // an ill-defined union bottom-k — the guard must aggregate over the
    // WHOLE sketch rows instead
    val a = Sketches.kmvSketch(
      (0 until 50).map(i => s"left $i").toDF("key"), "key", 16)
    val b = Sketches.kmvSketch(
      (0 until 50).map(i => s"right $i").toDF("key"), "key", 64)
    val e1 = intercept[Exception] { Sketches.kmvSetOps(a, b).collect() }
    assert(e1.getMessage.contains("k stamps"), e1.getMessage)
    val e2 = intercept[Exception] { Sketches.kmvJaccard(a, b).collect() }
    assert(e2.getMessage.contains("k stamps"), e2.getMessage)
    val e3 = intercept[Exception] {
      Sketches.mergeKmvSketches(a.unionByName(b)).collect()
    }
    assert(e3.getMessage.contains("k stamps"), e3.getMessage)
  }

  test("cmsEstimate preserves duplicate probe rows") {
    import spark.implicits._
    val sk = Sketches.cmsSketch(docs, "text", depth = 3, width = 64)
    val probes = Seq("p1", "p1", "p2").toDF("text")
    val est = Sketches.cmsEstimate(sk, probes, "text")
    // one output row per probe ROW (the probe relation's cardinality is
    // not the operator's to change), duplicates answering identically
    assert(est.count() == 3)
    val p1 = est.where(F.col("text") === "p1")
      .select("estimate").collect().map(_.getLong(0)).toSeq
    assert(p1.size == 2 && p1.distinct.size == 1, p1.toString)
  }
}

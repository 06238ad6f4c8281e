package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** Measured-recall gates for the APPROXIMATE sketch configurations.
  *
  * The exact-config oracle twins (IVF nprobe=k, LSH nbits=0, MinHash
  * bands=k, …) prove the machinery is correct where it degenerates to the
  * exact algorithm; nothing there pins what the approximate configs
  * actually retrieve. These tests plant duplicates at KNOWN similarity
  * levels in a fully deterministic corpus (index-derived vocabulary,
  * seeded vectors, no RNG at query time) and assert measured recall
  * against the published analytic bound for each sketch:
  *
  *   - MinHash+LSH banding: P(candidate | jaccard s) = 1-(1-s^r)^b
  *     (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4);
  *   - random-hyperplane LSH: P(bits agree) = (1-θ/π)^nbits
  *     (Charikar 2002, SimHash rounding scheme);
  *   - IVF: recall ≥ nprobe/k on uniform routing, ≈1 for a query that is
  *     a small perturbation of a corpus vector (it lands in its source's
  *     cluster).
  *
  * Every corpus is deterministic AND every sketch uses fixed seeded
  * hashes, so measured recall is a constant — a run that fails here means
  * a kernel change moved retrieval quality, not sampling noise. The ε
  * margins absorb only the one-time finite-sample deviation of the fixed
  * hash draw from the analytic expectation (100 planted pairs per level,
  * binomial σ ≈ 0.05).
  */
class RecallSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // ---- planted text corpus ------------------------------------------------
  // Docs of L=50 unique words → m=48 word-trigram shingles. A pair shares a
  // c+2-word prefix and diverges after it: |A∩B| = c shingles exactly (the
  // 2 junction-crossing trigrams per side are unique), |A| = |B| = m, so
  // jaccard = c/(2m-c) by construction. Vocabulary is disjoint across pairs
  // and levels, so planted pairs are independent and cross-pair similarity
  // is 0.
  private val L = 50
  private val M = L - 2
  private val PairsPerLevel = 100
  // target jaccard → shared-shingle count c (c = round(2mJ/(1+J)))
  private val Levels: Seq[(String, Int)] = Seq(
    "j90" -> 45, "j80" -> 43, "j70" -> 40, "j60" -> 36, "j50" -> 32,
    "j20" -> 16) // j20 sits below every threshold used — a precision probe
  private def plantedJaccard(c: Int): Double = c.toDouble / (2 * M - c)

  private def pairDocs(li: Int, c: Int, p: Int): ((Long, String), (Long, String)) = {
    val shared = (0 until c + 2).map(i => s"l${li}p${p}s$i")
    val aTail = (0 until L - (c + 2)).map(i => s"l${li}p${p}a$i")
    val bTail = (0 until L - (c + 2)).map(i => s"l${li}p${p}b$i")
    val aId = li * 10000L + p * 2L
    ((aId, (shared ++ aTail).mkString(" ")),
     (aId + 1, (shared ++ bTail).mkString(" ")))
  }

  private lazy val planted: Map[String, Seq[((Long, String), (Long, String))]] =
    Levels.zipWithIndex.map { case ((name, c), li) =>
      name -> (0 until PairsPerLevel).map(p => pairDocs(li, c, p)).toSeq
    }.toMap

  private def textCorpus: DataFrame = {
    import spark.implicits._
    planted.values.flatten.flatMap { case (a, b) => Seq(a, b) }
      .toSeq.toDF("doc_id", "text")
  }

  /** 1-(1-s^r)^b — the banding candidate probability. */
  private def bandBound(s: Double, r: Int, b: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  test("minhash+lsh approximate config: recall meets the 1-(1-s^r)^b bound per planted level") {
    val k = 32; val bands = 8; val r = k / bands
    val found = Dedup.minhashLshPairs(textCorpus, "text", "doc_id",
        k = k, bands = bands, n = 3, threshold = 0.45)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val eps = 0.15
    for ((name, c) <- Levels if name != "j20") {
      val s = plantedJaccard(c)
      val pairs = planted(name).map { case ((a, _), (b, _)) => (a, b) }
      val recall = pairs.count(found.contains).toDouble / pairs.size
      val bound = bandBound(s, r, bands)
      assert(recall >= bound - eps,
        f"$name: recall $recall%.3f < bound $bound%.3f - $eps (jaccard $s%.3f)")
    }
    // precision is exact, not probabilistic: the j20 pairs sit below the
    // 0.45 threshold, so none may survive verification even as candidates
    val j20 = planted("j20").map { case ((a, _), (b, _)) => (a, b) }
    assert(j20.count(found.contains) == 0)
    // and nothing across pairs can clear the threshold (disjoint vocab)
    val plantedSet = Levels.flatMap(l => planted(l._1))
      .map { case ((a, _), (b, _)) => (a, b) }.toSet
    assert(found.subsetOf(plantedSet))
  }

  test("incremental near-dup approximate config: same banding bound over a persisted index") {
    import spark.implicits._
    val k = 32; val bands = 8; val r = k / bands
    // history holds each pair's A side, the batch its B side — recall is
    // measured through the index-probe path (minhashBandIndex +
    // incrementalNearDupPairs), the shape an incremental pipeline runs
    val history = planted.values.flatten.map(_._1).toSeq.toDF("doc_id", "text")
    val batch = planted.values.flatten.map(_._2).toSeq.toDF("doc_id", "text")
    val index = Dedup.minhashBandIndex(history, "text", "doc_id", k, bands, 3)
    val found = Dedup.incrementalNearDupPairs(index, history, batch,
        "text", "doc_id", k, bands, 3, threshold = 0.45)
      .select("batch_id", "hist_id").collect()
      .map(x => (x.getLong(1), x.getLong(0))).toSet // (hist A, batch B)
    val eps = 0.15
    for ((name, c) <- Levels if name != "j20") {
      val s = plantedJaccard(c)
      val pairs = planted(name).map { case ((a, _), (b, _)) => (a, b) }
      val recall = pairs.count(found.contains).toDouble / pairs.size
      val bound = bandBound(s, r, bands)
      assert(recall >= bound - eps,
        f"$name: recall $recall%.3f < bound $bound%.3f - $eps (jaccard $s%.3f)")
    }
    val j20 = planted("j20").map { case ((a, _), (b, _)) => (a, b) }
    assert(j20.count(found.contains) == 0)
  }

  // ---- planted vector corpus ----------------------------------------------
  // 2000 seeded unit vectors (dim 16); 100 queries, each a small fixed
  // perturbation of corpus vector 20i — its true nearest neighbor by a wide
  // margin (random 16-dim cosines concentrate well below 0.9).
  private val Dim = 16
  private val NVec = 2000
  private val NQ = 100

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private lazy val corpusVecs: IndexedSeq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(7)
    (0 until NVec).map(i => (i.toLong, unit(Array.fill(Dim)(rnd.nextGaussian()))))
  }

  private lazy val queryVecs: IndexedSeq[(Long, Long, Array[Double])] = {
    val rnd = new scala.util.Random(11)
    (0 until NQ).map { i =>
      val src = i * (NVec / NQ)
      val v = corpusVecs(src)._2
      val q = unit(v.zip(Array.fill(Dim)(rnd.nextGaussian() * 0.05))
        .map { case (x, e) => x + e })
      (100000L + i, src.toLong, q)
    }
  }

  private def cosD(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))

  private def vecDf(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("ivf approximate config: planted-neighbor recall ~1, top-k recall >= nprobe/k floor") {
    val corpus = vecDf(corpusVecs.map { case (id, v) => (id, v.toSeq) })
    val queries = vecDf(queryVecs.map { case (qid, _, q) => (qid, q.toSeq) })
    val kClusters = 16; val nprobe = 4; val topk = 5
    val index = Ivf.build(corpus, "id", "v", k = kClusters, iters = 3)
    val got = Ivf.topK(index, queries, "id", "v", k = topk, nprobe = nprobe,
        excludeSelf = false)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // a query that is a tiny perturbation of a corpus vector must find its
    // source: the query routes to (almost always) the source's own cluster
    val plantedRecall = queryVecs.count { case (qid, src, _) =>
      got.getOrElse(qid, Set.empty).contains(src)
    }.toDouble / NQ
    assert(plantedRecall >= 0.9, f"planted-neighbor recall $plantedRecall%.3f < 0.9")
    // general top-k recall vs the exact scan cannot fall under the uniform
    // nprobe/k routing floor (and in practice sits far above it)
    val exact = Similarity.bruteForceTopK(corpus, queries, "id", "v", "id", topk)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val topkRecall = queryVecs.map { case (qid, _, _) =>
      val g = got.getOrElse(qid, Set.empty); val e = exact(qid)
      (g intersect e).size.toDouble / e.size
    }.sum / NQ
    val floor = nprobe.toDouble / kClusters
    assert(topkRecall >= floor,
      f"top-$topk recall $topkRecall%.3f < nprobe/k floor $floor%.3f")
  }

  test("ivf filtered probe: pre-filtering the candidate stage keeps recall " +
    "against the filtered exact scan; post-filtering collapses on a skewed filter") {
    val corpus = vecDf(corpusVecs.map { case (id, v) => (id, v.toSeq) })
    val queries = vecDf(queryVecs.map { case (qid, _, q) => (qid, q.toSeq) })
    val kClusters = 16; val nprobe = 4; val topk = 5
    val index = Ivf.build(corpus, "id", "v", k = kClusters, iters = 3)
    // skewed metadata filter: 10% of the corpus qualifies (every planted
    // source does: src = 20·i ≡ 0 mod 10)
    val allowed = corpus.where(F.col("id") % 10 === 0)
    // ground truth: exact top-k over the FILTERED corpus
    val exact = Similarity.bruteForceTopK(allowed, queries, "id", "v", "id", topk)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallOf(m: Map[Long, Set[Long]]): Double = queryVecs.map {
      case (qid, _, _) =>
        val e = exact(qid)
        (m.getOrElse(qid, Set.empty) intersect e).size.toDouble / e.size
    }.sum / NQ
    // PRE-filter: predicate semi-joins the probed lists before ranking
    val pre = Ivf.topKFiltered(index, queries, "id", "v", k = topk,
        allowed = allowed, allowedIdCol = "id",
        nprobe = nprobe, excludeSelf = false)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // POST-filter strawman: rank unfiltered, then drop non-matching rows —
    // the k slots filled with non-matching neighbors first
    val post = Ivf.topK(index, queries, "id", "v", k = topk,
        nprobe = nprobe, excludeSelf = false)
      .join(allowed.select(F.col("id").as("nbr_id")), Seq("nbr_id"), "left_semi")
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val preRecall = recallOf(pre)
    val postRecall = recallOf(post)
    val floor = nprobe.toDouble / kClusters
    assert(preRecall >= floor,
      f"pre-filter recall $preRecall%.3f < nprobe/k floor $floor%.3f")
    assert(preRecall >= postRecall + 0.2,
      f"pre-filter $preRecall%.3f should dominate post-filter $postRecall%.3f")
    // the planted source (allowed by construction) still surfaces
    val plantedRecall = queryVecs.count { case (qid, src, _) =>
      pre.getOrElse(qid, Set.empty).contains(src)
    }.toDouble / NQ
    assert(plantedRecall >= 0.9,
      f"filtered planted-neighbor recall $plantedRecall%.3f < 0.9")
  }

  test("lsh filtered probe: only allowed neighbors surface; planted recall " +
    "meets the Charikar bound on the allowed sources") {
    val corpus = vecDf(corpusVecs.map { case (id, v) => (id, v.toSeq) })
    val queries = vecDf(queryVecs.map { case (qid, _, q) => (qid, q.toSeq) })
    val nbits = 8; val topk = 5
    val allowed = corpus.where(F.col("id") % 10 === 0) // all planted sources
    val got = Similarity.lshTopKFiltered(corpus, queries, "id", "v", "id",
        topk, allowed = allowed, allowedIdCol = "id", nbits = nbits)
      .select("query_id", "nbr_id").collect()
    // the pre-filter is a hard guarantee: every slot matches the predicate
    assert(got.nonEmpty && got.forall(_.getLong(1) % 10 == 0))
    val byQ = got.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val plantedRecall = queryVecs.count { case (qid, src, _) =>
      byQ.getOrElse(qid, Set.empty).contains(src)
    }.toDouble / NQ
    val thetaMax = queryVecs.map { case (_, src, q) =>
      math.acos(math.min(1.0, cosD(q, corpusVecs(src.toInt)._2)))
    }.max
    val bound = math.pow(1.0 - thetaMax / math.Pi, nbits)
    assert(plantedRecall >= bound - 0.15,
      f"filtered planted recall $plantedRecall%.3f < bound $bound%.3f - 0.15")
  }

  test("ivf-pq filtered probe: pre-filtering the probed code lists keeps " +
    "recall; post-filtering the ranked output collapses on a skewed filter") {
    val corpus = vecDf(corpusVecs.map { case (id, v) => (id, v.toSeq) })
    val queries = vecDf(queryVecs.map { case (qid, _, q) => (qid, q.toSeq) })
    val kClusters = 16; val nprobe = 4; val topk = 5
    val index = Ivf.build(corpus, "id", "v", k = kClusters, iters = 3)
    val cb = graft.pipeline.Quantize.trainPq(corpus, "id", "v",
      m = 2, ks = 32, iters = 2)
    val enc = graft.pipeline.Quantize.encodePqWithCells(index, cb)
    // skewed filter: 10% qualifies, every planted source does
    val allowed = corpus.where(F.col("id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(allowed, queries, "id", "v", "id", topk)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallOf(m: Map[Long, Set[Long]]): Double = queryVecs.map {
      case (qid, _, _) =>
        val e = exact(qid)
        (m.getOrElse(qid, Set.empty) intersect e).size.toDouble / e.size
    }.sum / NQ
    val pre = graft.pipeline.Quantize.ivfPqTopKFiltered(index, enc, queries,
        "id", "v", k = topk, nprobe = nprobe, cb, allowed = allowed,
        allowedIdCol = "id", excludeSelf = false)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // every slot matches the predicate — the pre-filter hard guarantee
    assert(pre.values.forall(_.forall(_ % 10 == 0)))
    val post = graft.pipeline.Quantize.ivfPqTopK(index, enc, queries,
        "id", "v", k = topk, nprobe = nprobe, cb, excludeSelf = false)
      .join(allowed.select(F.col("id").as("nbr_id")), Seq("nbr_id"), "left_semi")
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val preRecall = recallOf(pre)
    val postRecall = recallOf(post)
    assert(preRecall >= nprobe.toDouble / kClusters,
      f"pre-filter recall $preRecall%.3f < nprobe/k floor")
    assert(preRecall >= postRecall + 0.2,
      f"pre-filter $preRecall%.3f should dominate post-filter $postRecall%.3f")
    // planted sources (allowed by construction) still surface through the
    // quantized scorer
    val plantedRecall = queryVecs.count { case (qid, src, _) =>
      pre.getOrElse(qid, Set.empty).contains(src)
    }.toDouble / NQ
    assert(plantedRecall >= 0.8,
      f"filtered planted-neighbor recall $plantedRecall%.3f < 0.8")
  }

  test("hyperplane-lsh approximate config: planted-neighbor recall meets the (1-theta/pi)^nbits bound") {
    val corpus = vecDf(corpusVecs.map { case (id, v) => (id, v.toSeq) })
    val queries = vecDf(queryVecs.map { case (qid, _, q) => (qid, q.toSeq) })
    val nbits = 8; val topk = 5
    val got = Similarity.lshTopK(corpus, queries, "id", "v", "id", topk, nbits)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val plantedRecall = queryVecs.count { case (qid, src, _) =>
      got.getOrElse(qid, Set.empty).contains(src)
    }.toDouble / NQ
    // Charikar bound at the WORST planted angle: every hyperplane must
    // agree for query and source to share a bucket
    val thetaMax = queryVecs.map { case (_, src, q) =>
      math.acos(math.min(1.0, cosD(q, corpusVecs(src.toInt)._2)))
    }.max
    val bound = math.pow(1.0 - thetaMax / math.Pi, nbits)
    val eps = 0.15
    assert(plantedRecall >= bound - eps,
      f"planted recall $plantedRecall%.3f < bound $bound%.3f - $eps " +
        f"(worst planted angle $thetaMax%.3f rad)")
  }
}

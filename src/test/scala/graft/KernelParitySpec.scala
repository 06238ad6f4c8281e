package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity}

/** Bit-parity of the codegen'd hash-sketch kernels (SimHash64Expr,
  * LshBucketExpr) against their interpreted HOF reference formulations —
  * on the real documents/embeddings tables plus the null/empty edge cases
  * whose semantics the kernels contractually reproduce. */
class KernelParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import TestSession.sf

  test("simhash64 kernel == HOF formulation on the documents corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mismatches = docs.select(
        Dedup.simhash64(F.col("text")).as("k"),
        Dedup.simhash64Hof(F.col("text")).as("h"))
      .filter(F.col("k") =!= F.col("h") || F.col("k").isNull =!= F.col("h").isNull)
      .count()
    assert(mismatches == 0)
  }

  test("simhash64 kernel edge cases: null text and empty text fold to 0 votes") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, ""), (3L, "   "), (4L, "one"))
      .toDF("id", "text")
    val rows = df.select(F.col("id"),
        Dedup.simhash64(F.col("text")).as("k"),
        Dedup.simhash64Hof(F.col("text")).as("h"))
      .collect()
    rows.foreach { r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}") }
    // null text → 0L signature (HOF folds a null votes array to 0)
    assert(rows.find(_.getLong(0) == 1L).get.getLong(1) == 0L)
  }

  test("minhashSig kernel == HOF formulation on the documents corpus") {
    import graft.expressions.HashKernels
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = docs
      .select(F.col("doc_id"), Dedup.tokens(F.col("text")).as("toks"))
      .select(F.col("doc_id"), Dedup.shinglesFromTokens(F.col("toks"), 3).as("sh"))
    val k = 32
    val hof = F.array((0 until k).map(seed =>
      F.array_min(F.transform(F.col("sh"), s => F.xxhash64(F.lit(seed), s)))): _*)
    val mismatches = sh.select(
        HashKernels.minhashSig(F.col("sh"), k).as("kk"), hof.as("hh"))
      .filter(F.col("kk") =!= F.col("hh"))
      .count()
    assert(mismatches == 0)
  }

  test("minhashSig kernel edge cases: empty shingles → null slots; null → null") {
    import graft.expressions.HashKernels
    import spark.implicits._
    val df = Seq((1L, Array("a b c", "b c d")), (2L, Array.empty[String]),
      (3L, null: Array[String])).toDF("id", "sh")
    val rows = df.select(F.col("id"), HashKernels.minhashSig(F.col("sh"), 4).as("s"))
      .collect()
    assert(rows.find(_.getLong(0) == 1L).get.getSeq[Long](1).length == 4)
    // empty → 4 null slots (array_min-of-empty semantics per slot)
    assert(rows.find(_.getLong(0) == 2L).get.getSeq[Any](1).forall(_ == null))
    // null input → null signature (kernel-documented; the old HOF form gave
    // an array of nulls here — minhashLshPairs filters these out either way)
    assert(rows.find(_.getLong(0) == 3L).get.isNullAt(1))
  }

  test("winnow and token-set-hits kernels == HOF formulations on the corpus") {
    import graft.pipeline.TextAnalysis
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(1, 4, 9).foreach { w =>
      val mm = docs.select(
          TextAnalysis.winnowFingerprint(F.col("text"), w).as("k"),
          TextAnalysis.winnowFingerprintHof(F.col("text"), w).as("h"))
        .filter(F.col("k") =!= F.col("h")).count()
      assert(mm == 0, s"w=$w")
    }
    // token-set hits vs the filter/isin form, occurrences included
    val toks = TextAnalysis.tokens(F.col("text"))
    val words = TextAnalysis.stopwords.toMap.apply("en")
    val mm2 = docs.select(
        graft.expressions.TextKernels.tokenSetHits(toks, words).as("k"),
        F.size(F.filter(toks, t => t.isin(words: _*))).as("h"))
      .filter(F.col("k") =!= F.col("h")).count()
    assert(mm2 == 0)
    // mean token length: array_join total == aggregate fold total
    val mm3 = docs.select(
        TextAnalysis.meanTokenLength(F.col("text")).as("k"),
        (F.aggregate(toks, F.lit(0L), (acc, t) => acc + F.char_length(t))
          .cast("double") / F.size(toks)).as("h"))
      .filter(F.col("k") =!= F.col("h")).count()
    assert(mm3 == 0)
  }

  test("lshBucket kernel == HOF formulation on the embeddings table") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Seq(0, 1, 4, 8, 16).foreach { nbits => // 0 = single-bucket exact mode
      val mismatches = emb.select(
          Similarity.lshBucket(F.col("embedding"), nbits).as("k"),
          Similarity.lshBucketHof(F.col("embedding"), nbits).as("h"))
        .filter(F.col("k") =!= F.col("h"))
        .count()
      assert(mismatches == 0, s"nbits=$nbits")
    }
  }

  test("lshBucket kernel edge cases: null vector, null element, empty, double") {
    import spark.implicits._
    val df = Seq(
      (1L, null: Array[java.lang.Double]),
      (2L, Array[java.lang.Double](1.0, null, 3.0)),
      (3L, Array[java.lang.Double]()),
      (4L, Array[java.lang.Double](0.5, -1.5, 2.5, 0.0))
    ).toDF("id", "v")
    val rows = df.select(F.col("id"),
        Similarity.lshBucket(F.col("v"), 8).as("k"),
        Similarity.lshBucketHof(F.col("v"), 8).as("h"))
      .collect()
    rows.foreach { r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}") }
    // null vector and null element both collapse to bucket 0
    assert(rows.find(_.getLong(0) == 1L).get.getLong(1) == 0L)
    assert(rows.find(_.getLong(0) == 2L).get.getLong(1) == 0L)
  }
}

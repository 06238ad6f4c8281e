package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}

/** Benchmark decontamination: flag (or drop) training documents that share
  * word n-grams with an evaluation corpus — the standard guard against
  * test-set leakage in LLM training pipelines (n-gram overlap matching, as
  * popularized by the GPT-3/PaLM appendix decontamination procedures;
  * public methodology).
  *
  * Shape for 100 TB: the eval side is small (benchmark suites, thousands
  * of documents), so its distinct n-gram set broadcasts; the corpus side is
  * a single projection + explode with NO corpus-wide shuffle — the only
  * shuffle is the distinct over matched (doc, gram) hits, bounded by the
  * contamination volume, not the corpus. Shingling reuses the codegen'd
  * [[graft.expressions.WordShingles]] kernel (same semantics as the dedup
  * layer, incl. the short-doc whole-text fallback).
  */
object Decontaminate {

  /** (id, contaminated) for every document: true iff the document shares at
    * least one word `n`-gram with `evals`. */
  def overlapFlags(docs: DataFrame, textCol: String, idCol: String,
      evals: DataFrame, evalTextCol: String, n: Int = 8): DataFrame = {
    val evalGrams = evals
      .select(F.explode(Dedup.shingles(F.col(evalTextCol), n)).as("g"))
      .distinct()
    val hits = docs
      .select(F.col(idCol).as("id"), F.explode(Dedup.shingles(F.col(textCol), n)).as("g"))
      .join(F.broadcast(evalGrams), Seq("g"))
      .select("id").distinct()
    docs.select(F.col(idCol).as("id"))
      .join(hits.withColumn("contaminated", F.lit(true)), Seq("id"), "left")
      .select(F.col("id"), F.coalesce(F.col("contaminated"), F.lit(false)).as("contaminated"))
  }

  /** The clean corpus: documents with no eval overlap. */
  def removeContaminated(docs: DataFrame, textCol: String, idCol: String,
      evals: DataFrame, evalTextCol: String, n: Int = 8): DataFrame =
    docs.join(
      overlapFlags(docs, textCol, idCol, evals, evalTextCol, n)
        .where(F.col("contaminated")).select(F.col("id").as(idCol)),
      Seq(idCol), "anti")

  /** Semantic decontamination: (id, eval_id, max_cos, contaminated) for
    * every corpus document — the embedding-space complement of the n-gram
    * flags, catching paraphrased/translated eval leakage that shares no
    * n-gram with the benchmark (the SemDeDup insight applied to the
    * decontamination problem). `eval_id` is the nearest eval item
    * (highest cosine, ties to the highest id — the lexicographic struct
    * max, reproduced exactly by the gate's SQL oracle).
    *
    * Shape: the eval side broadcasts (benchmark suites are small), cosine
    * runs in the codegen'd [[graft.expressions.VectorKernels]] kernel, and
    * the only shuffle is the per-doc max — the corpus is read once. This
    * exact pass is O(N·|evals|); for corpus-scale eval sets route through
    * [[Ivf.topK]] (nprobe clusters per eval item) and threshold the
    * result instead. */
  /** `excludeSelf` drops (doc, eval) pairs with equal ids — set it ONLY
    * when the eval set is a subset of the corpus sharing its id space
    * (self-search), never for an independent benchmark whose ids merely
    * happen to overlap the corpus ids: there it would silently skip real
    * comparisons. Same contract as [[Ivf.topK]]'s flag. */
  def semanticOverlapFlags(docs: DataFrame, idCol: String, vecCol: String,
      evals: DataFrame, evalIdCol: String, evalVecCol: String,
      threshold: Double = 0.95, excludeSelf: Boolean = false): DataFrame = {
    val e = evals.select(F.col(evalIdCol).as("eval_id"), F.col(evalVecCol).as("ev"))
    val paired = docs.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
      .crossJoin(F.broadcast(e))
    (if (excludeSelf) paired.where(F.col("id") =!= F.col("eval_id")) else paired)
      .withColumn("cos",
        graft.expressions.VectorKernels.cosine(F.col("v"), F.col("ev")))
      .groupBy("id")
      .agg(F.max(F.struct(F.col("cos"), F.col("eval_id"))).as("best"))
      .select(F.col("id"), F.col("best.eval_id").as("eval_id"),
        F.col("best.cos").as("max_cos"),
        (F.col("best.cos") >= threshold).as("contaminated"))
  }
}

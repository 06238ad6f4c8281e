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
}

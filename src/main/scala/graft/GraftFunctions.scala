package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.expressions._

/** SQL registration of the engine's native kernels, so `spark.sql` users
  * get the same codegen'd expressions the Scala API uses:
  *
  *   - `graft_simhash64(tokens)`        — 64-bit SimHash of a token array
  *   - `graft_minhash_sig(tokens, k)`   — k-slot MinHash signature
  *   - `graft_lsh_bucket(vec, nbits)`   — random-hyperplane LSH bucket
  *   - `graft_shingles(text, n)`        — distinct word n-gram hashes
  *   - `graft_normalize(text[, form])`  — UAX#15 normalization (NFC default)
  *   - `graft_winnow(text, w)`          — winnowing fingerprint min-hash
  *   - `graft_text_stats(text)`         — single-pass quality counters
  *   - `graft_uuidv7()`                 — time-ordered row id
  *
  * Two ways in: `GraftFunctions.register(spark)` on a live session, or
  * `spark.sql.extensions=graft.GraftExtensions` at session build (the
  * standard `SparkSessionExtensions.injectFunction` path — same
  * registrations, chosen at config time like any Spark extension). Sketch
  * parameters (k, nbits, n, w) must be integer literals: they size codegen
  * and, for the dedup sketches, are part of the index contract. */
object GraftFunctions {
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got: $other")
  }

  private def strLit(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got: $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int*): Unit =
    require(n.contains(args.length),
      s"$fn takes ${n.mkString(" or ")} arguments, got ${args.length}")

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_simhash64"), info("graft_simhash64"),
        args => { arity("graft_simhash64", args, 1); SimHash64Expr(args.head) }),
      (FunctionIdentifier("graft_minhash_sig"), info("graft_minhash_sig"),
        args => { arity("graft_minhash_sig", args, 2)
          MinHashSigExpr(args.head, intLit(args(1), "graft_minhash_sig", "k")) }),
      (FunctionIdentifier("graft_lsh_bucket"), info("graft_lsh_bucket"),
        args => { arity("graft_lsh_bucket", args, 2)
          LshBucketExpr(args.head, intLit(args(1), "graft_lsh_bucket", "nbits")) }),
      (FunctionIdentifier("graft_shingles"), info("graft_shingles"),
        args => { arity("graft_shingles", args, 2)
          WordShingles(args.head, intLit(args(1), "graft_shingles", "n")) }),
      (FunctionIdentifier("graft_normalize"), info("graft_normalize"),
        args => { arity("graft_normalize", args, 1, 2)
          UnicodeNormalize(args.head,
            if (args.length == 2) strLit(args(1), "graft_normalize", "form") else "NFC") }),
      (FunctionIdentifier("graft_winnow"), info("graft_winnow"),
        args => { arity("graft_winnow", args, 2)
          WinnowMinHash(args.head, intLit(args(1), "graft_winnow", "w")) }),
      (FunctionIdentifier("graft_text_stats"), info("graft_text_stats"),
        args => { arity("graft_text_stats", args, 1)
          TextQualityStats(args.head, graft.pipeline.QualityFilters.Stopwords) }),
      (FunctionIdentifier("graft_uuidv7"), info("graft_uuidv7"),
        args => { arity("graft_uuidv7", args, 0); UuidV7() }))

  /** Register every function on a live session (notebooks, tests). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach(ext.injectFunction)
}

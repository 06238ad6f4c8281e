package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{HashKernels, TextKernels}

/** The SQL surface of the native kernels: `GraftFunctions.register` must
  * give `spark.sql` users bit-identical results to the Scala Column API
  * (both routes build the same catalyst expressions). */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSession.spark
    GraftFunctions.register(s)
    s
  }

  private lazy val docs = {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("sql_docs")
    df
  }

  test("graft_simhash64 and graft_minhash_sig match the Column API bit-for-bit") {
    docs // force view
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash64(split(text, ' ')) AS sh,
        |       graft_minhash_sig(split(text, ' '), 16) AS sig
        |FROM sql_docs ORDER BY doc_id""".stripMargin).collect()
    val viaApi = docs.select(F.col("doc_id"),
        HashKernels.simhash64(F.split(F.col("text"), " ")).as("sh"),
        graft.expressions.HashKernels.minhashSig(F.split(F.col("text"), " "), 16).as("sig"))
      .orderBy("doc_id").collect()
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getSeq[Long](2) == b.getSeq[Long](2))
    }
  }

  test("graft_normalize, graft_shingles, graft_text_stats run from SQL") {
    docs
    val r = spark.sql(
      """SELECT graft_normalize('café') AS n,
        |       size(graft_shingles(split('a b c d', ' '), 2)) AS ns,
        |       graft_text_stats('the quick fox').word_count AS wc""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "café")
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 3)
  }

  test("graft_uuidv7 yields distinct time-ordered ids") {
    val ids = spark.sql(
      "SELECT graft_uuidv7() AS id FROM range(100)").collect().map(_.getString(0))
    assert(ids.distinct.length == 100)
    // 26-char base32hex (48-bit millis prefix → lexicographic time order)
    assert(ids.forall(_.length == 26))
  }

  test("store views: spark.sql reads versioned tables, frozen at registration") {
    import spark.implicits._
    val store = new graft.store.TableStore(
      java.nio.file.Files.createTempDirectory("graft-sqlviews").toString, spark)
    store.write("c", "people", Seq(("ann", 1), ("bo", 2)).toDF("name", "v"))
    val views = store.registerViews("c")
    assert(views == Seq("c_people"))
    assert(spark.sql("SELECT count(*) AS n FROM c_people").head().getLong(0) == 2)
    // a view is a frozen snapshot: a new commit doesn't change it until
    // re-registration advances HEAD
    store.write("c", "people", Seq(("cy", 3)).toDF("name", "v"))
    assert(spark.sql("SELECT count(*) AS n FROM c_people").head().getLong(0) == 2)
    store.registerViews("c")
    assert(spark.sql("SELECT count(*) AS n FROM c_people").head().getLong(0) == 1)
    // and the kernels compose with the store views in one SQL statement
    val sh = spark.sql(
      "SELECT graft_simhash64(split(name, '')) AS h FROM c_people").collect()
    assert(sh.length == 1)
  }

  test("store views: colliding mangled names error instead of silently shadowing") {
    import spark.implicits._
    val store = new graft.store.TableStore(
      java.nio.file.Files.createTempDirectory("graft-sqlviews-clash").toString, spark)
    // 'a_b'/'c' and 'a'/'b_c' both mangle to view name a_b_c
    store.write("a_b", "c", Seq((1, "x")).toDF("id", "tag"))
    store.write("a", "b_c", Seq((2, "y"), (3, "z")).toDF("id", "tag"))
    store.registerViews("a_b")
    val e = intercept[IllegalArgumentException](store.registerViews("a"))
    assert(e.getMessage.contains("view name collision"))
    // the earlier registration is still the one served
    assert(spark.sql("SELECT count(*) AS n FROM a_b_c").head().getLong(0) == 1)
    // re-registering the SAME pair is a replace, not a collision
    store.registerViews("a_b")
  }

  test("sketch parameters must be literals — a column there is an error") {
    docs
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(split(text,' '), doc_id) FROM sql_docs")
        .collect()
    }
    assert(e.getMessage.contains("integer literal")
      || Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}

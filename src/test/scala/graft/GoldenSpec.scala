package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableFrame
import graft.flow.FlowEngine
import graft.sources.{AvroFiles, FileSink, FileSource}
import graft.store.{TableRef, TableStore}

/** End-to-end golden-output corpus, porting the reference's
  * `testing_resources/<case>/` pattern (`tests_tabsdata/testing_resources`:
  * each case = input data + a small function + `expected_result.json` with
  * `$td.*` masked). The comparison mirrors `conftest.py:345-360`
  * (`read_json_and_clean`/`clean_polars_df`): drop `$td.*` system columns,
  * sort columns by name, sort rows, then compare values.
  *
  * Inputs live in `src/test/resources/golden/<case>/`; binary-format inputs
  * (avro, parquet) are staged from literal rows at test time since they
  * don't belong in text resources. */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val golden = "src/test/resources/golden"

  /** Canonical form: drop system columns, route both sides through JSON
    * type inference so dtypes unify, sort columns and rows. */
  private def canon(df: DataFrame): Seq[String] = {
    val clean = df.drop(df.columns.filter(_.startsWith("$td")).toSeq: _*)
    val json = spark.read.json(
      spark.createDataset(clean.toJSON.collect().toSeq)(Encoders.STRING))
    val cols = json.columns.sorted.toSeq
    json.select(cols.map(F.col): _*).collect().map(_.toString).sorted.toSeq
  }

  private def expected(path: String): Seq[String] =
    canon(spark.read.option("multiLine", "true").json(path))

  private def check(produced: DataFrame, expectedPath: String): Unit =
    assert(canon(produced) == expected(expectedPath))

  private def readCase(dir: String, file: String, format: String,
      options: Map[String, String] = Map.empty): DataFrame =
    FileSource(s"$golden/$dir/$file", format, options)
      .load(spark, Map.empty).head

  test("golden: csv with modified separator, drop_nulls") {
    val tf = TableFrame.fromRaw(readCase("csv_separator_drop_nulls", "data.csv",
      "csv", Map("sep" -> ";")))
    check(tf.drop_nulls().df, s"$golden/csv_separator_drop_nulls/expected_result.json")
  }

  test("golden: csv full-file dtype inference passthrough") {
    val df = readCase("csv_dtype_inference", "data.csv", "csv")
    // inference must land on long/double/boolean/date, not strings
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("id") == "integer" || types("id") == "long")
    assert(types("amount") == "double" && types("flag") == "boolean")
    check(df, s"$golden/csv_dtype_inference/expected_result.json")
  }

  test("golden: ndjson ingest + with_columns derived total") {
    import graft.td
    val tf = TableFrame.fromRaw(readCase("ndjson_with_columns", "data.ndjson", "ndjson"))
    val out = tf.with_columns("total" -> (td.col("qty") * td.col("price")))
    check(out.df, s"$golden/ndjson_with_columns/expected_result.json")
  }

  test("golden: log ingest + grok typed captures") {
    val tf = TableFrame.fromRaw(readCase("log_grok", "data.log", "log"))
    val out = tf
      .grok("value",
        "%{WORD:level} job=%{WORD:job} rows=%{INT:rows:int} took=%{NUMBER:took:float}")
      .selectCols("level", "job", "rows", "took")
    check(out.df, s"$golden/log_grok/expected_result.json")
  }

  test("golden: wildcard glob yields per-file frames; explicit concat (rs log_wildcard shape)") {
    val dfs = FileSource(s"$golden/wildcard_concat/parts/*.csv", "csv")
      .load(spark, Map.empty)
    assert(dfs.length == 2) // one frame per matched file, reference list semantics
    check(dfs.reduce(_.unionByName(_)),
      s"$golden/wildcard_concat/expected_result.json")
  }

  test("golden: wildcard frames joined by ID; non-matching sibling excluded (rs input_file_wildcard)") {
    // reference contract: source_*.csv binds a LIST of frames (len 2 — the
    // function raises unless exactly the two matches arrive; another_file
    // .csv sits beside them and must NOT match), joined inner on ID
    val dfs = FileSource(s"$golden/file_wildcard/source_*.csv", "csv")
      .load(spark, Map.empty)
    assert(dfs.length == 2, s"expected exactly 2 matched frames, got ${dfs.length}")
    val joined = TableFrame.fromRaw(dfs.head)
      .join(TableFrame.fromRaw(dfs(1)), on = Seq("ID"), how = "inner")
    check(joined.df, s"$golden/file_wildcard/expected_result.json")
  }

  test("golden: jsonl file output round-trips") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-golden-jsonl").toString
    val df = Seq(("EU", 300.5), ("US", 120.25), ("APAC", 990.0))
      .toDF("region", "sales")
    FileSink(s"$out/sales", format = "jsonl").write(df)
    check(spark.read.json(s"$out/sales"),
      s"$golden/output_jsonl/expected_result.json")
  }

  test("golden: avro ingest + filter") {
    import graft.td
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-golden-avro").toString
    AvroFiles.write(
      Seq(("alice", 61.0), ("bob", 70.5), ("carol", 88.5), ("dave", 92.0))
        .toDF("name", "score"),
      s"$stage/people", "overwrite")
    val tf = TableFrame.fromRaw(
      FileSource(s"$stage/people", "avro").load(spark, Map.empty).head)
    check(tf.filter(td.col("score") > 80.0).df,
      s"$golden/avro_filter/expected_result.json")
  }

  test("golden: parquet ingest + column projection") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-golden-parquet").toString
    Seq(("osaka", 2691, "jp"), ("lyon", 513, "fr"), ("quito", 2011, "ec"))
      .toDF("city", "pop", "cc").write.parquet(s"$stage/cities")
    val tf = TableFrame.fromRaw(
      FileSource(s"$stage/cities", "parquet").load(spark, Map.empty).head)
    check(tf.selectCols("city", "pop").df,
      s"$golden/parquet_passthrough/expected_result.json")
  }

  test("golden: two-hop flow (publisher -> transformer) publishes golden output") {
    import graft.td
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-store").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "sales", Seq("raw")) { ctx =>
      Seq(TableFrame.fromRaw(
        FileSource(s"$golden/flow_two_hop/source.csv", "csv")
          .load(spark, Map.empty).head))
    }
    engine.transformer("tx", "sales", Seq("raw"), Seq("revenue")) { ctx =>
      Seq(ctx.input(0)
        .with_columns("revenue" -> (td.col("units") * td.col("unit_price")))
        .selectCols("sku", "revenue"))
    }
    engine.trigger("pub")
    val out = store.scan(TableRef.parse("revenue", "sales")).get
    check(out.df, s"$golden/flow_two_hop/expected_result.json")
    // trigger propagated: both tables got exactly one committed version,
    // stamped with the same execution
    assert(store.versions("sales", "raw").size == 1)
    assert(store.versions("sales", "revenue").size == 1)
  }

  test("golden: csv string format — inference off, every column a string") {
    val df = readCase("csv_string_format", "data.csv", "csv",
      Map("inferSchema" -> "false"))
    assert(df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    check(df, s"$golden/csv_string_format/expected_result.json")
  }

  test("golden: ndjson full dtype inference (long/double/boolean/null)") {
    val df = readCase("ndjson_dtype_inference", "data.ndjson", "ndjson")
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("id") == "long" && types("price") == "double" &&
      types("active") == "boolean")
    check(df, s"$golden/ndjson_dtype_inference/expected_result.json")
  }

  test("golden: log wildcard glob + grok over multiple files") {
    val frames = FileSource(s"$golden/log_wildcard/logs/*.log", "log")
      .load(spark, Map.empty)
    assert(frames.length == 2) // per-file frames; td.concat is explicit
    val tf = TableFrame.fromRaw(frames.reduce(_.unionByName(_)))
    val out = tf.grok("value",
        "%{WORD:level} job=%{WORD:job} rows=%{INT:rows:int} took=%{NUMBER:took:float}")
      .selectCols("level", "job", "rows", "took")
    check(out.df, s"$golden/log_wildcard/expected_result.json")
  }

  test("golden: avro wildcard concatenates sibling directories") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-golden-avrow").toString
    AvroFiles.write(Seq(("alice", 61.0), ("bob", 70.5)).toDF("name", "score"),
      s"$stage/people1", "overwrite")
    AvroFiles.write(Seq(("carol", 88.5), ("dave", 92.0)).toDF("name", "score"),
      s"$stage/people2", "overwrite")
    val dfs = FileSource(s"$stage/people*", "avro").load(spark, Map.empty)
    assert(dfs.length == 2) // one frame per matched directory
    check(dfs.reduce(_.unionByName(_)), s"$golden/avro_wildcard/expected_result.json")
  }

  test("golden: missing location is None, matched-but-unparsable still throws") {
    // reference: test_input_file_not_found — a listing that matches nothing
    // is a None input, not an error...
    assert(FileSource(s"$golden/no_such_case/missing*.csv", "csv")
      .load(spark, Map.empty).isEmpty)
    // ...but a file that MATCHES and fails to parse is still a loud failure:
    // the empty-listing path must never swallow format errors
    val stage = Files.createTempDirectory("graft-golden-junk")
    Files.write(stage.resolve("junk.avro"), "not an avro container".getBytes)
    intercept[Throwable] {
      FileSource(s"$stage/junk.avro", "avro").load(spark, Map.empty).head.collect()
    }
  }

  test("golden: two inputs, two outputs in one transformer (rs multiple_inputs_multiple_outputs)") {
    import graft.td
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-mio").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("p_orders", "shop", Seq("orders")) { _ =>
      Seq(TableFrame.fromRaw(readCase("multi_io", "orders.csv", "csv")))
    }
    engine.publisher("p_cust", "shop", Seq("customers")) { _ =>
      Seq(TableFrame.fromRaw(readCase("multi_io", "customers.csv", "csv")))
    }
    // trigger only once both inputs exist
    engine.transformer("tx", "shop", Seq("orders", "customers"),
        Seq("joined", "totals"), triggerBy = Some(Seq("customers"))) { ctx =>
      val joined = ctx.input(0).join(ctx.input(1), on = Seq("cust_id"))
        .selectCols("order_id", "name", "amount")
      val totals = joined.group_by("name")
        .agg(td.col("amount").sum.as("total"))
      Seq(joined, totals)
    }
    engine.trigger("p_orders")
    engine.trigger("p_cust")
    check(store.scan("shop/joined").get.df, s"$golden/multi_io/expected_joined.json")
    check(store.scan("shop/totals").get.df, s"$golden/multi_io/expected_totals.json")
  }

  test("golden: None output slot commits an empty version with carried schema") {
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-none").toString, spark)
    val engine = new FlowEngine(store, spark)
    var giveData = true
    engine.publisher("pub", "c", Seq("raw")) { _ =>
      Seq(TableFrame.fromRaw(readCase("with_none", "data.csv", "csv")))
    }
    engine.transformer("maybe", "c", Seq("raw"), Seq("out")) { ctx =>
      if (giveData) Seq(ctx.input(0)) else Seq(null)
    }
    engine.trigger("pub")
    assert(store.scan("c/out").get.df.count() == 2)
    giveData = false
    engine.runFunction(engine.fn("maybe"), store.newId())
    val head = store.scan("c/out").get.df
    check(head, s"$golden/with_none/expected_result.json")
    // schema carried over from the previous version, not collapsed to zero cols
    assert(head.columns.count(!_.startsWith("$td")) == 2)
    assert(store.versions("c", "out").size == 2)
  }

  test("golden: jdbc-backed incremental flow — re-run loads only new rows") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-derby")}/db;create=true"
    JdbcSink(url, "src_rows", mode = "append")
      .write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("seq", "val"))
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-jdbcflow").toString, spark)
    val engine = new FlowEngine(store, spark)
    val src = JdbcSource(url,
      Seq("""SELECT "seq" AS "id", "val" FROM src_rows WHERE "seq" > $offset$"""))
    engine.publisher("pub", "c", Seq("t")) { ctx =>
      val df = src.load(spark, ctx.offsets).head
      val mx = df.agg(F.max("id")).head()
      if (!mx.isNullAt(0)) ctx.setOffset("offset", mx.getInt(0).toString)
      Seq(TableFrame.fromRaw(df))
    }
    engine.trigger("pub")
    check(store.scan("c/t").get.df, s"$golden/jdbc_flow/expected_run1.json")
    // new upstream rows arrive; the persisted offset makes run 2 incremental
    JdbcSink(url, "src_rows", mode = "append")
      .write(Seq((4, "d"), (5, "e")).toDF("seq", "val"))
    engine.trigger("pub")
    check(store.scan("c/t").get.df, s"$golden/jdbc_flow/expected_run2.json")
  }

  test("golden: jdbc subscriber writes a store table out to a live database") {
    import graft.sources.{JdbcSink, JdbcSource}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-derby2")}/db;create=true"
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-jdbcsub").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "inv", Seq("stock")) { _ =>
      import spark.implicits._
      Seq(TableFrame.fromRaw(Seq(("A1", 4), ("B2", 9)).toDF("sku", "qty")))
    }
    engine.subscriber("sub", "inv", Seq("stock")) { ctx =>
      JdbcSink(url, "stock_out", mode = "overwrite").write(ctx.input(0).toExport)
      Nil
    }
    engine.trigger("pub")
    val back = JdbcSource(url, Seq("""SELECT "sku", "qty" FROM stock_out"""))
      .load(spark, Map.empty).head
    check(back, s"$golden/jdbc_subscriber/expected_result.json")
  }

  test("golden: sql source with named initial values — stored offsets take over") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    // reference: test_input_sql_initial_values — `:number` seeded from the
    // declared initial_values on run 1; the function's returned {"number": 3}
    // (our ctx.setOffset) governs run 2
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-iv")}/db;create=true"
    JdbcSink(url, "INVOICE_HEADER", mode = "append").write(Seq(
      (1, "Arvind"), (2, "Tucu"), (3, "Dimas"),
      (4, "Joaquin"), (5, "Jennifer"), (6, "Aleix")).toDF("id", "name"))
    JdbcSink(url, "INVOICE_ITEM", mode = "append").write(Seq(
      (1, "Leonardo"), (2, "Donatello"), (3, "Michelangelo"),
      (4, "Raphael"), (5, "Splinter")).toDF("id", "name"))
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-ivstore").toString, spark)
    val engine = new FlowEngine(store, spark)
    val src = JdbcSource(url,
      Seq("""SELECT "id", "name" FROM INVOICE_HEADER WHERE "id" > :number""",
        """SELECT "id", "name" FROM INVOICE_ITEM WHERE "id" > :number"""),
      initialValues = Map("number" -> "2"))
    engine.publisher("pub", "c", Seq("headers", "items")) { ctx =>
      val dfs = src.load(spark, ctx.offsets)
      ctx.setOffset("number", "3")
      dfs.map(df => TableFrame.fromRaw(df))
    }
    engine.trigger("pub")
    check(store.scan("c/headers").get.df,
      s"$golden/sql_initial_values/expected_headers_run1.json")
    check(store.scan("c/items").get.df,
      s"$golden/sql_initial_values/expected_items_run1.json")
    engine.trigger("pub")
    check(store.scan("c/headers").get.df,
      s"$golden/sql_initial_values/expected_headers_run2.json")
    check(store.scan("c/items").get.df,
      s"$golden/sql_initial_values/expected_items_run2.json")
  }

  test("golden: initial values freeze — untouched offsets repeat the run") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    // reference: test_initial_values_freeze — the function returns "SAME"
    // (here: never calls setOffset), so run 2 sees the same `:number` and
    // yields the same rows as run 1
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-frz")}/db;create=true"
    JdbcSink(url, "INVOICE_HEADER", mode = "append").write(Seq(
      (1, "Arvind"), (2, "Tucu"), (3, "Dimas"),
      (4, "Joaquin"), (5, "Jennifer"), (6, "Aleix")).toDF("id", "name"))
    JdbcSink(url, "INVOICE_ITEM", mode = "append").write(Seq(
      (1, "Leonardo"), (2, "Donatello"), (3, "Michelangelo"),
      (4, "Raphael"), (5, "Splinter")).toDF("id", "name"))
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-frzstore").toString, spark)
    val engine = new FlowEngine(store, spark)
    val src = JdbcSource(url,
      Seq("""SELECT "id", "name" FROM INVOICE_HEADER WHERE "id" > :number""",
        """SELECT "id", "name" FROM INVOICE_ITEM WHERE "id" > :number"""),
      initialValues = Map("number" -> "2"))
    engine.publisher("pub", "c", Seq("headers", "items")) { ctx =>
      src.load(spark, ctx.offsets).map(df => TableFrame.fromRaw(df))
    }
    engine.trigger("pub")
    engine.trigger("pub")
    check(store.scan("c/headers").get.df,
      s"$golden/initial_values_freeze/expected_result1.json")
    check(store.scan("c/items").get.df,
      s"$golden/initial_values_freeze/expected_result2.json")
    assert(store.versions("c", "headers").size == 2)
  }

  test("golden: missing input location — no frame, empty version published") {
    // reference: test_input_file_not_found — the function receives df=None
    // (here: an empty load) and the output still commits a version
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-nf").toString, spark)
    val engine = new FlowEngine(store, spark)
    val src = FileSource(s"$golden/input_not_found/not_found", "csv")
    engine.publisher("pub", "c", Seq("out")) { ctx =>
      val dfs = src.load(spark, ctx.offsets)
      assert(dfs.isEmpty)
      Seq(null)
    }
    engine.trigger("pub")
    val out = store.scan("c/out").get.df
    assert(out.count() == 0)
    check(out, s"$golden/input_not_found/expected_result.json")
  }

  test("golden: None result for a SQL destination slot — write skipped") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-sqlnone")}/db;create=true"
    val snk = JdbcSink(url, "stock", mode = "append")
    snk.write(Seq(("a", 1), ("b", 2)).toDF("sku", "qty"))
    snk.write(None) // the reference's None slot: no rows added, no error
    val back = JdbcSource(url, Seq("""SELECT "sku", "qty" FROM stock"""))
      .load(spark, Map.empty).head
    check(back, s"$golden/sql_output_none/expected_result.json")
  }

  test("golden: wrong JDBC driver class fails loudly") {
    import spark.implicits._
    import graft.sources.JdbcSink
    // reference: test_output_sql_wrong_driver_fails
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-baddrv")}/db;create=true"
    val e = intercept[Throwable] {
      JdbcSink(url, "t", properties = Map("driver" -> "com.example.MissingDriver"))
        .write(Seq((1, "a")).toDF("id", "v"))
    }
    val expectedClass = spark.read.option("multiLine", "true")
      .json(s"$golden/sql_wrong_driver/expected_error.json")
      .head().getString(0)
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
    assert(chain.exists(_.getClass.getName.contains(expectedClass)))
  }

  test("golden: subscriber fans one table out to csv and jsonl files") {
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-fan").toString, spark)
    val engine = new FlowEngine(store, spark)
    val out = Files.createTempDirectory("graft-golden-fanout").toString
    engine.publisher("pub", "sales", Seq("s")) { _ =>
      Seq(TableFrame.fromRaw(readCase("subscriber_files", "data.csv", "csv")))
    }
    engine.subscriber("sub", "sales", Seq("s")) { ctx =>
      val export = ctx.input(0).toExport
      FileSink(s"$out/as_csv", format = "csv").write(export)
      FileSink(s"$out/as_jsonl", format = "jsonl").write(export)
      Nil
    }
    engine.trigger("pub")
    check(spark.read.option("header", "true").option("inferSchema", "true").csv(s"$out/as_csv"),
      s"$golden/subscriber_files/expected_result.json")
    check(spark.read.json(s"$out/as_jsonl"),
      s"$golden/subscriber_files/expected_result.json")
  }

  test("golden: corpus curation flow — incremental dedup, score, split, pack") {
    // the full training-data curation chain run THROUGH the store/flow
    // machinery: publisher lands the raw batch + a history table, one
    // transformer rejects history dups (id 2) and in-batch copies (id 4
    // loses to id 1), quality-scores, splits, and packs the survivors;
    // every expected value is hand-computed in the case's expected json
    import graft.pipeline.{DataMix, Dedup, Packing, QualityFilters}
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-curation").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "c", Seq("docs", "history")) { _ =>
      Seq(TableFrame.fromRaw(readCase("curation_flow", "docs.ndjson", "ndjson")),
        TableFrame.fromRaw(readCase("curation_flow", "history.ndjson", "ndjson")))
    }
    engine.transformer("curate", "c", Seq("docs", "history"), Seq("curated")) { ctx =>
      val docs = ctx.input(0).df
      val hist = ctx.input(1).df
      val keep = Dedup.incrementalNew(hist, docs, "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
      val fresh = docs.join(keep, Seq("doc_id"), "left_semi")
        .withColumn("n_chars", F.char_length(F.col("text")).cast("long"))
      val scored = QualityFilters.withQualityScore(fresh, "text",
        keep = Seq("doc_id", "n_chars"))
      val split = DataMix.split(scored, "doc_id", valFrac = 0.1, testFrac = 0.1)
      val packed = Packing.packByBudget(split, "doc_id", "n_chars", budget = 64)
      Seq(TableFrame.fromRaw(packed.select(
        "doc_id", "n_chars", "passes_quality", "split", "pack_id", "pack_pos")))
    }
    engine.trigger("pub")
    check(store.scan("c/curated").get.df,
      s"$golden/curation_flow/expected_result.json")
  }

  test("golden: quality pipeline — gopher signals over a deterministic corpus") {
    import graft.pipeline.QualityFilters
    val docs = readCase("quality_pipeline", "docs.ndjson", "ndjson")
    val out = QualityFilters.withGopherSignals(docs, "text", keep = Seq("doc_id"))
      .select("doc_id", "word_count", "stopword_hits", "passes_gopher")
    check(out, s"$golden/quality_pipeline/expected_result.json")
  }

  test("golden: version selector input@HEAD~1 reads the previous version") {
    import spark.implicits._
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-vsel").toString, spark)
    val engine = new FlowEngine(store, spark)
    var rows = Seq(("A", 10.0), ("B", 20.0))
    engine.publisher("pub", "c", Seq("prices")) { _ =>
      Seq(TableFrame.fromRaw(rows.toDF("sku", "price")))
    }
    engine.trigger("pub")
    rows = Seq(("A", 11.0), ("B", 22.0)) // v2 (HEAD)
    engine.trigger("pub")
    // subscriber-style read pinned to the PREVIOUS version
    engine.transformer("prev", "c", Seq("prices@HEAD~1"), Seq("prices_prev")) { ctx =>
      Seq(ctx.input(0))
    }
    engine.runFunction(engine.fn("prev"), store.newId())
    check(store.scan("c/prices_prev").get.df,
      s"$golden/version_selector/expected_result.json")
  }

  test("golden: catalog sink registers a queryable table (session catalog)") {
    import spark.implicits._
    val table = s"golden_cities_${System.nanoTime()}"
    graft.sources.CatalogSink(table).write(
      Seq(("osaka", 2691), ("lyon", 513), ("quito", 2011)).toDF("city", "pop"))
    check(spark.table(table), s"$golden/catalog_sink/expected_result.json")
    spark.sql(s"DROP TABLE $table")
  }

  test("golden: partitioned store write keeps partition-column types on scan") {
    import spark.implicits._
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-part").toString, spark)
    val df = Seq(("2024-01-01", 1, "a"), ("2024-01-01", 2, "b"),
      ("2024-01-02", 3, "c")).toDF("day", "id", "v")
    val ctx = graft.core.SysCtx.fresh()
    store.stageWrite("c", "t", df, ctx, partitionBy = Seq("day"))
    store.commitTransaction(ctx.transaction)
    val back = store.scan("c/t").get.df
    // partition values read back as strings (staged schema), not re-inferred
    assert(back.schema("day").dataType == org.apache.spark.sql.types.StringType)
    check(back, s"$golden/store_partitioned/expected_result.json")
  }

  test("golden: chained quality pipeline (html strip → pii scrub → gopher filter)") {
    import graft.pipeline.QualityFilters
    val docs = readCase("quality_chain", "docs.ndjson", "ndjson")
    val stripped = docs.select(F.col("doc_id"),
      QualityFilters.stripHtml(F.col("text")).as("clean0"))
    val scrubbed = stripped.select(F.col("doc_id"),
      QualityFilters.scrubPii(F.col("clean0")).as("clean_text"),
      QualityFilters.piiCounts(F.col("clean0")).head._2.as("n_emails"))
    val flagged = QualityFilters.withGopherSignals(
      scrubbed, "clean_text", keep = Seq("doc_id", "clean_text", "n_emails"))
    val out = flagged.where(F.col("passes_gopher"))
      .select("doc_id", "clean_text", "n_emails", "passes_gopher")
    check(out, s"$golden/quality_chain/expected_result.json")
  }

  test("golden: incremental file-source flow — second trigger loads only the new file") {
    import graft.sources.{FileSource, Sources}
    val in = Files.createTempDirectory("graft-golden-incr")
    Files.writeString(in.resolve("p1.csv"), "id,v\n1,a\n2,b\n")
    val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z")
    Files.setLastModifiedTime(in.resolve("p1.csv"),
      java.nio.file.attribute.FileTime.from(t0))
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-incrstore").toString, spark)
    val engine = new FlowEngine(store, spark)
    val src = FileSource(s"$in/*.csv", "csv")
    engine.publisher("pub", "c", Seq("t")) { ctx =>
      val dfs = src.load(spark, ctx.offsets)
      src.nextOffsets(dfs).foreach { case (k, v) => ctx.setOffset(k, v) }
      Seq(TableFrame.fromRaw(dfs.headOption.getOrElse(
        spark.emptyDataFrame.selectExpr("1 as id", "'x' as v").limit(0))))
    }
    engine.trigger("pub")
    check(store.scan("c/t").get.df, s"$golden/file_incremental/expected_run1.json")
    Files.writeString(in.resolve("p2.csv"), "id,v\n3,c\n")
    Files.setLastModifiedTime(in.resolve("p2.csv"),
      java.nio.file.attribute.FileTime.from(t0.plusSeconds(60)))
    engine.trigger("pub")
    check(store.scan("c/t").get.df, s"$golden/file_incremental/expected_run2.json")
  }

  test("golden: a failed run advances neither the offset nor the table (rs failed_execution)") {
    // ports the reference's failure semantics: a function that raises must
    // leave no committed version AND no advanced offset, so the retry sees
    // exactly the data the failed run saw (offset_utils.py: offsets persist
    // only after a successful run; _tabsserver error-code contract)
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-retry").toString, spark)
    val engine = new FlowEngine(store, spark)
    var poison = true
    engine.publisher("pub", "c", Seq("t")) { ctx =>
      val prev = ctx.offsets.getOrElse("max_id", "0").toLong
      val df = readCase("offset_retry", "data.ndjson", "ndjson")
        .where(F.col("id") > prev)
      val mx = df.agg(F.max("id")).head()
      if (!mx.isNullAt(0)) ctx.setOffset("max_id", mx.getLong(0).toString)
      if (poison) throw new RuntimeException("downstream exploded")
      Seq(TableFrame.fromRaw(df))
    }
    intercept[RuntimeException](engine.trigger("pub"))
    // nothing moved: no committed version, offset file still empty
    assert(store.scan("c/t").isEmpty)
    assert(graft.flow.Offsets.load(store.root, "pub").isEmpty)
    // the retry reads the SAME rows the failed run saw and commits them
    poison = false
    engine.trigger("pub")
    check(store.scan("c/t").get.df, s"$golden/offset_retry/expected_result.json")
    assert(graft.flow.Offsets.load(store.root, "pub") == Map("max_id" -> "3"))
    // an idle re-run (no rows past the offset) keeps the offset frozen
    engine.trigger("pub")
    assert(graft.flow.Offsets.load(store.root, "pub") == Map("max_id" -> "3"))
  }

  test("golden: trigger chain across three collections runs in dependency order") {
    import graft.td
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-chain").toString, spark)
    val engine = new FlowEngine(store, spark)
    val out = Files.createTempDirectory("graft-golden-chainout").toString
    engine.publisher("pub", "ingest", Seq("raw")) { _ =>
      Seq(TableFrame.fromRaw(readCase("trigger_chain", "raw.csv", "csv")))
    }
    // cross-collection input: analytics reads ingest/raw
    engine.transformer("tx", "analytics", Seq("ingest/raw"), Seq("revenue")) { ctx =>
      Seq(ctx.input(0)
        .with_columns("revenue" -> (td.col("units") * td.col("unit_price")))
        .selectCols("sku", "revenue"))
    }
    // and exports subscribes to analytics/revenue
    engine.subscriber("sub", "exports", Seq("analytics/revenue")) { ctx =>
      val top = ctx.input(0).sort(Seq("revenue"), descending = Seq(true)).head(2)
      FileSink(s"$out/top", format = "jsonl").write(top.toExport)
      Nil
    }
    val ran = engine.trigger("pub")
    assert(ran == Seq("pub", "tx", "sub")) // BFS dependency order
    check(store.scan("analytics/revenue").get.df,
      s"$golden/trigger_chain/expected_revenue.json")
    check(spark.read.json(s"$out/top"), s"$golden/trigger_chain/expected_top.json")
    // one execution: all three stamped, each table exactly one version
    assert(store.versions("ingest", "raw").size == 1)
    assert(store.versions("analytics", "revenue").size == 1)
  }

  test("golden: format conversion matrix — one source through every sink format") {
    // rs format-conversion breadth: the same frame written and re-read
    // through each sink format must canon-equal the same expected output
    val src = readCase("format_matrix", "data.csv", "csv")
    val stage = Files.createTempDirectory("graft-golden-matrix").toString
    for (fmt <- Seq("csv", "jsonl", "parquet", "orc", "avro")) {
      FileSink(s"$stage/$fmt", format = fmt).write(src)
      val back = FileSource(s"$stage/$fmt",
        if (fmt == "jsonl") "ndjson" else fmt).load(spark, Map.empty).head
      check(back, s"$golden/format_matrix/expected_result.json")
    }
  }

  test("golden: ndjson string format — primitives arrive as strings") {
    val df = readCase("ndjson_string_format", "data.ndjson", "ndjson",
      Map("primitivesAsString" -> "true"))
    assert(df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    check(TableFrame.fromRaw(df).drop_nulls().df,
      s"$golden/ndjson_string_format/expected_result.json")
  }

  test("golden: parquet string format — typed columns cast to strings") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-golden-pqsf").toString
    Seq(("saw", 310, Option(1.4)), ("plane", 240, Option(0.9)),
        ("adze", 150, Option.empty[Double]))
      .toDF("tool", "len_mm", "weight_kg").write.parquet(s"$stage/tools")
    val typed = FileSource(s"$stage/tools", "parquet").load(spark, Map.empty).head
    val asStrings = typed.select(typed.columns.map(c =>
      F.col(c).cast(org.apache.spark.sql.types.StringType).as(c)).toSeq: _*)
    check(TableFrame.fromRaw(asStrings).drop_nulls().df,
      s"$golden/parquet_string_format/expected_result.json")
  }

  test("golden: ndjson wildcard per-file frames, concatenated") {
    val dfs = FileSource(s"$golden/ndjson_wildcard/parts/*.ndjson", "ndjson")
      .load(spark, Map.empty)
    assert(dfs.length == 2)
    check(dfs.reduce(_.unionByName(_)),
      s"$golden/ndjson_wildcard/expected_result.json")
  }

  test("golden: parquet wildcard frames over sibling directories, concatenated") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-golden-pqw").toString
    Seq(("lyon", 513), ("osaka", 2691)).toDF("city", "pop")
      .write.parquet(s"$stage/cities1")
    Seq(("quito", 2011)).toDF("city", "pop").write.parquet(s"$stage/cities2")
    val dfs = FileSource(s"$stage/cities*", "parquet").load(spark, Map.empty)
    assert(dfs.length == 2)
    check(dfs.reduce(_.unionByName(_)),
      s"$golden/ndjson_wildcard/expected_result.json")
  }

  test("golden: literal-constructed frame through publish (rs input_output_dataframe)") {
    import spark.implicits._
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-iodf").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "c", Seq("sales")) { _ =>
      Seq(TableFrame.fromRaw(
        Seq(("EU", 300.5), ("US", 120.25), ("APAC", 990.0)).toDF("region", "sales")))
    }
    engine.trigger("pub")
    check(store.scan("c/sales").get.df,
      s"$golden/input_output_dataframe/expected_result.json")
  }

  test("golden: csv modified format — pipe separator, comments, multi null markers") {
    import graft.sources.{CsvFormat, FileFormatSpec}
    val df = FileFormatSpec.read(spark, s"$golden/csv_modified_format/data.csv",
      CsvFormat(separator = "|", inputCommentPrefix = Some("#"),
        inputNullValues = Seq("NA", "null")))
    // the secondary null marker re-inference must land stock on a numeric type
    assert(df.schema("stock").dataType !=
      org.apache.spark.sql.types.StringType)
    check(TableFrame.fromRaw(df).drop_nulls().df,
      s"$golden/csv_modified_format/expected_result.json")
  }

  test("golden: avro string format — typed container cast to strings") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-golden-avsf").toString
    AvroFiles.write(
      Seq(("s1", Option(21.5), Option(true)), ("s2", Option.empty[Double], Option(true)),
          ("s3", Option(19.0), Option(false)))
        .toDF("sensor", "reading", "ok"),
      s"$stage/sensors", "overwrite")
    val typed = FileSource(s"$stage/sensors", "avro").load(spark, Map.empty).head
    val asStrings = typed.select(typed.columns.map(c =>
      F.col(c).cast(org.apache.spark.sql.types.StringType).as(c)).toSeq: _*)
    check(TableFrame.fromRaw(asStrings).drop_nulls().df,
      s"$golden/avro_string_format/expected_result.json")
  }

  test("golden: log string format — raw lines arrive untyped and untouched") {
    val df = readCase("log_string_format", "data.log", "log")
    assert(df.schema.fields.toSeq.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("value", "string")))
    check(df, s"$golden/log_string_format/expected_result.json")
  }

  test("golden: csv modified path — glob descends into dated subdirectories") {
    val dfs = FileSource(s"$golden/csv_modified_path/y*/[ab].csv", "csv")
      .load(spark, Map.empty)
    assert(dfs.length == 2) // y2025/a.csv and y2026/b.csv, one frame each
    check(dfs.reduce(_.unionByName(_)),
      s"$golden/csv_modified_path/expected_result.json")
  }

  test("golden: one output slot fed by a frame list written as sibling files (rs frame_list)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-golden-framelist").toString
    val src = Seq(("x", 2L), ("y", 9L), ("z", 4L)).toDF("k", "size")
    // the reference's frame-list output: each frame lands in its own file
    // under one destination; readers see the concatenation via the glob
    val small = src.where(F.col("size") < 5)
      .agg(F.lit("small").as("bucket"), F.count(F.lit(1)).as("n"))
    val large = src.where(F.col("size") >= 5)
      .agg(F.lit("large").as("bucket"), F.count(F.lit(1)).as("n"))
    FileSink(s"$out/buckets/part0", format = "jsonl").write(small)
    FileSink(s"$out/buckets/part1", format = "jsonl").write(large)
    check(spark.read.json(s"$out/buckets/part*"),
      s"$golden/output_frame_list/expected_result.json")
  }

  test("golden: zone-less watermark reads as UTC (rs select_datetime_timezone)") {
    val in = Files.createTempDirectory("graft-golden-wmtz")
    val t0 = java.time.Instant.parse("2026-03-01T12:00:00Z")
    Files.writeString(in.resolve("old.csv"), "id,v\n1,a\n2,b\n")
    Files.setLastModifiedTime(in.resolve("old.csv"),
      java.nio.file.attribute.FileTime.from(t0))
    Files.writeString(in.resolve("new.csv"), "id,v\n3,c\n")
    Files.setLastModifiedTime(in.resolve("new.csv"),
      java.nio.file.attribute.FileTime.from(t0.plusSeconds(3600)))
    // zone-less ISO timestamp between the two mtimes: parsed as UTC, it
    // must admit only the newer file — a zone-shifted reading would let
    // both (or neither) through
    val dfs = FileSource(s"$in/*.csv", "csv",
      modifiedAfter = Some("2026-03-01T12:30:00")).load(spark, Map.empty)
    check(dfs.head, s"$golden/file_watermark_tz/expected_result.json")
    // and a watermark after both mtimes loads nothing (no frames, not a
    // schema-inference crash)
    assert(FileSource(s"$in/*.csv", "csv",
      modifiedAfter = Some("2026-03-01T14:00:00")).load(spark, Map.empty).isEmpty)
  }

  test("golden: a custom exception propagates out of trigger with type+message (rs custom_execution_exception)") {
    class PipelineContractViolation(msg: String) extends RuntimeException(msg)
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-exc").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "c", Seq("t")) { _ =>
      Seq(TableFrame.fromRaw(readCase("custom_exception", "data.csv", "csv")))
    }
    engine.transformer("tx", "c", Seq("t"), Seq("out")) { _ =>
      throw new PipelineContractViolation("rows failed the contract: 7")
    }
    // the user's exception type and message survive the engine untouched —
    // the reference surfaces them through its error-code/report path
    val e = intercept[PipelineContractViolation](engine.trigger("pub"))
    assert(e.getMessage == "rows failed the contract: 7")
    // upstream publication committed before the failure; the failed
    // function's own output did not
    assert(store.scan("c/t").isDefined && store.scan("c/out").isEmpty)
  }

  test("golden: a plain exception propagates the same way (rs general_execution_exception)") {
    // the generic-path twin of the custom-exception case: a bare
    // RuntimeException (the reference's `raise Exception(...)`) must ride
    // the identical surface — same type, same message, no wrapping — and
    // the failed function's outputs must not commit
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-genexc").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "c", Seq("t")) { _ =>
      throw new RuntimeException("This is a test exception")
    }
    val e = intercept[RuntimeException](engine.trigger("pub"))
    assert(e.getMessage == "This is a test exception")
    assert(e.getClass == classOf[RuntimeException]) // not wrapped
    assert(store.scan("c/t").isEmpty)
  }

  test("golden: extension-less file with an explicit format override (rs s3_explicit_format)") {
    // the reference reads `data_no_extension` from a bucket with
    // format="csv" forced; the same contract locally — the reader must
    // trust the declared format, never the (absent) extension
    val dir = Files.createTempDirectory("graft-golden-explfmt")
    Files.writeString(dir.resolve("data_no_extension"),
      "ID,Name,Qty\n1,widget,4\n2,gear,\n3,bolt,9\n")
    val df = FileSource(s"$dir/data_no_extension", "csv")
      .load(spark, Map.empty).head
    check(TableFrame.fromRaw(df).drop_nulls().df,
      s"$golden/explicit_format/expected_result.json")
  }

  test("golden: single-element table list is still the list shape (rs output_sql_list_single_element)") {
    import spark.implicits._
    import graft.sources.{JdbcSource, JdbcTxnSink}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-sql1")}/db;create=true"
    // a 1-element list destination must behave exactly like the n-element
    // one (list plumbing, staging, txn), not degrade to the scalar path
    JdbcTxnSink(url, Seq("SOLO_OUT"))
      .writeAll(Seq(Some(Seq(("A1", 4), ("B2", 9)).toDF("sku", "qty"))))
    check(JdbcSource(url, Seq("""SELECT "sku", "qty" FROM SOLO_OUT"""))
      .load(spark, Map.empty).head, s"$golden/sql_output_list/expected_a.json")
  }

  test("golden: csv output datetime format via chrono specifiers") {
    import spark.implicits._
    import graft.sources.{CsvFormat, FileFormatSpec}
    val out = Files.createTempDirectory("graft-golden-csvdt").toString
    val df = Seq(
      ("boot", java.sql.Timestamp.valueOf("2026-03-01 08:30:00")),
      ("sync", java.sql.Timestamp.valueOf("2026-03-02 17:45:00")))
      .toDF("event", "at")
    // the reference's chrono (Rust strftime) specifiers, translated
    FileFormatSpec.write(df, s"$out/events",
      CsvFormat(outputDatetimeFormat = Some("%Y/%m/%d %H:%M")))
    val back = FileSource(s"$out/events", "csv",
      Map("inferSchema" -> "false")).load(spark, Map.empty).head
    check(back, s"$golden/csv_output_datetime/expected_result.json")
  }

  test("golden: jdbc replace mode — second write replaces, not appends (rs table_replace)") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-derby3")}/db;create=true"
    JdbcSink(url, "stock", mode = "overwrite")
      .write(Seq(("A1", 4)).toDF("sku", "qty"))
    JdbcSink(url, "stock", mode = "overwrite")
      .write(Seq(("B2", 12), ("C3", 1)).toDF("sku", "qty"))
    val back = JdbcSource(url, Seq("""SELECT "sku", "qty" FROM stock"""))
      .load(spark, Map.empty).head
    check(back, s"$golden/jdbc_replace/expected_result.json")
  }

  test("golden: source plugin with offsets — second run yields only new rows (rs plugin_initial_values)") {
    import spark.implicits._
    val upstream = scala.collection.mutable.ArrayBuffer(
      (1L, "p1"), (2L, "p2"))
    val src = new graft.sources.Source {
      override def load(s: org.apache.spark.sql.SparkSession,
          offsets: Map[String, String]) = {
        val from = offsets.getOrElse("seq", "0").toLong
        Seq(upstream.filter(_._1 > from).toSeq.toDF("seq", "payload"))
      }
      override def nextOffsets(dfs: Seq[org.apache.spark.sql.DataFrame]) = {
        val mx = dfs.head.agg(F.max("seq")).head()
        if (mx.isNullAt(0)) Map.empty else Map("seq" -> mx.getLong(0).toString)
      }
    }
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-plugoff").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "c", Seq("t")) { ctx =>
      val dfs = src.load(spark, ctx.offsets)
      src.nextOffsets(dfs).foreach { case (k, v) => ctx.setOffset(k, v) }
      dfs.map(TableFrame.fromRaw(_))
    }
    engine.trigger("pub")
    check(store.scan("c/t").get.df, s"$golden/plugin_offsets/expected_run1.json")
    upstream += ((3L, "p3"))
    engine.trigger("pub")
    check(store.scan("c/t").get.df, s"$golden/plugin_offsets/expected_run2.json")
  }

  test("golden: schema-qualified JDBC destination writes into its schema (rs output_postgres_schema)") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    // the reference writes to "testing_schema.output_postgres_schema" on a
    // database where the schema pre-exists; mirror with an explicit Derby
    // schema and a schema-qualified dbtable through the same sink
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-sch")}/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate("CREATE SCHEMA TESTSCH")
    finally conn.close()
    JdbcSink(url, "TESTSCH.stock", mode = "append")
      .write(Seq(("A1", 4), ("B2", 12)).toDF("sku", "qty"))
    val back = JdbcSource(url, Seq("""SELECT "sku", "qty" FROM TESTSCH.stock"""))
      .load(spark, Map.empty).head
    check(back, s"$golden/jdbc_schema/expected_result.json")
    // the unqualified name resolves to the default schema, which must NOT
    // have received the rows
    val leaked = intercept[Exception] {
      JdbcSource(url, Seq("""SELECT "sku" FROM stock""")).load(spark, Map.empty)
        .head.collect()
    }
    assert(leaked != null)
  }

  test("golden: URI-list input concatenates locations into one table (rs s3_uri_list)") {
    import graft.sources.MultiFileSource
    val df = MultiFileSource(Seq(
        s"$golden/input_uri_list/a/*.csv", s"$golden/input_uri_list/b/*.csv"))
      .load(spark, Map.empty).head
    check(df, s"$golden/input_uri_list/expected_result.json")
    // watermark semantics survive the list: nothing new → no frames
    val wm = MultiFileSource(Seq(
        s"$golden/input_uri_list/a/*.csv", s"$golden/input_uri_list/b/*.csv"),
      modifiedAfter = Some("2099-01-01T00:00:00Z"))
    assert(wm.load(spark, Map.empty).isEmpty)
  }

  test("golden: source plugin with multiple outputs feeds multiple tables") {
    // reference test_input_plugin_multiple_inputs: one SourcePlugin run
    // yields several frames, each landing in its own declared table
    import spark.implicits._
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-pmulti").toString, spark)
    val engine = new FlowEngine(store, spark)
    val src = new graft.sources.Source {
      override def load(s: org.apache.spark.sql.SparkSession,
          offsets: Map[String, String]) = Seq(
        Seq((1, "a"), (2, "b")).toDF("id", "v"),
        Seq(("X", 7), ("Y", 9)).toDF("code", "n"))
    }
    engine.publisher("pub", "c", Seq("t1", "t2")) { ctx =>
      src.load(spark, ctx.offsets).map(TableFrame.fromRaw(_))
    }
    engine.trigger("pub")
    check(store.scan("c/t1").get.df, s"$golden/plugin_multi/expected_t1.json")
    check(store.scan("c/t2").get.df, s"$golden/plugin_multi/expected_t2.json")
    // both landed in one transaction
    assert(store.versions("c", "t1").head.transaction ==
      store.versions("c", "t2").head.transaction)
  }

  test("golden: multi-output transformer commits both tables in one transaction") {
    import graft.td
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-store2").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "shop", Seq("orders")) { _ =>
      Seq(TableFrame.fromRaw(
        FileSource(s"$golden/multi_output_txn/data.csv", "csv")
          .load(spark, Map.empty).head))
    }
    engine.transformer("split", "shop", Seq("orders"), Seq("high", "by_cat")) { ctx =>
      val in = ctx.input(0)
      Seq(
        in.filter(td.col("amount") >= 20.0),
        in.group_by("category").agg(td.col("amount").sum.as("total")))
    }
    engine.trigger("pub")
    check(store.scan(TableRef.parse("high", "shop")).get.df,
      s"$golden/multi_output_txn/expected_high.json")
    check(store.scan(TableRef.parse("by_cat", "shop")).get.df,
      s"$golden/multi_output_txn/expected_by_cat.json")
    // atomicity: one transaction id spans both outputs
    val tx1 = store.versions("shop", "high").head.transaction
    val tx2 = store.versions("shop", "by_cat").head.transaction
    assert(tx1 == tx2)
  }

  test("golden: initial values declaring the wrong key fail loudly (rs initial_values_wrong_key_type)") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-wrongkey")}/db;create=true"
    JdbcSink(url, "T", mode = "append").write(Seq((1, "a")).toDF("id", "name"))
    // the query names :number, the declared initial values a typo'd `numbr`:
    // the placeholder survives substitution and the database rejects it —
    // a loud failure, never an empty/silently-wrong result
    val src = JdbcSource(url,
      Seq("""SELECT "id", "name" FROM T WHERE "id" > :number"""),
      initialValues = Map("numbr" -> "2"))
    val e = intercept[Throwable](src.load(spark, Map.empty).head.collect())
    val expectedClass = spark.read.option("multiLine", "true")
      .json(s"$golden/sql_initial_values_wrong_key/expected_error.json")
      .head().getString(0)
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
    assert(chain.exists(_.getClass.getName.contains(expectedClass)))
  }

  test("golden: modified JDBC connection params load the same rows (rs sql_modified_params)") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-modparam")}/db;create=true"
    JdbcSink(url, "T", mode = "append").write(
      Seq((1, "Arvind"), (2, "Tucu"), (3, "Dimas")).toDF("id", "name"))
    val back = JdbcSource(url, Seq("""SELECT "id", "name" FROM T"""),
        properties = Map("fetchsize" -> "2", "queryTimeout" -> "30"))
      .load(spark, Map.empty).head
    check(back, s"$golden/sql_modified_params/expected_result.json")
  }

  test("golden: frame list to a list of SQL tables, None slots skipped (rs output_sql_list/_none)") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-sqllist")}/db;create=true"
    val frames: Seq[Option[DataFrame]] = Seq(
      Some(Seq(("A1", 4), ("B2", 9)).toDF("sku", "qty")),
      None, // reference: the None element writes nothing and is not an error
      Some(Seq(("X", 7), ("Y", 9)).toDF("code", "n")))
    val tables = Seq("OUT_A", "OUT_SKIPPED", "OUT_B")
    tables.zip(frames).foreach { case (t, f) => JdbcSink(url, t).write(f) }
    check(JdbcSource(url, Seq("""SELECT "sku", "qty" FROM OUT_A"""))
      .load(spark, Map.empty).head, s"$golden/sql_output_list/expected_a.json")
    check(JdbcSource(url, Seq("""SELECT "code", "n" FROM OUT_B"""))
      .load(spark, Map.empty).head, s"$golden/sql_output_list/expected_b.json")
    // the None slot's table was never created
    intercept[Throwable](JdbcSource(url, Seq("SELECT * FROM OUT_SKIPPED"))
      .load(spark, Map.empty).head.collect())
  }

  test("golden: multi-table SQL write is transactional — a failing frame commits nothing (rs output_sql_transaction)") {
    import spark.implicits._
    import graft.sources.{JdbcSource, JdbcTxnSink}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-sqltxn")}/db;create=true"
    val good = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    // the reference's rollback trigger: a frame with a list column cannot
    // be serialized to SQL; the FIRST frame must not be stored either
    val bad = Seq((Seq(1), 4), (Seq(2), 5)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      JdbcTxnSink(url, Seq("TXN_FIRST", "TXN_SECOND"))
        .writeAll(Seq(Some(good), Some(bad)))
    }
    intercept[Throwable](JdbcSource(url, Seq("SELECT * FROM TXN_FIRST"))
      .load(spark, Map.empty).head.collect())
    // mid-transaction failure rolls BOTH back: pre-create the second target
    // with an incompatible shape so its staged INSERT fails after the first
    // target's statements succeeded
    JdbcTxnSink(url, Seq("TXN_SECOND")).writeAll(Seq(Some(Seq(Tuple1(9)).toDF("only"))))
    intercept[Throwable] {
      JdbcTxnSink(url, Seq("TXN_FIRST", "TXN_SECOND"))
        .writeAll(Seq(Some(good), Some(good)))
    }
    intercept[Throwable](JdbcSource(url, Seq("SELECT * FROM TXN_FIRST"))
      .load(spark, Map.empty).head.collect())
    // happy path: both frames commit in one transaction
    JdbcTxnSink(url, Seq("TXN_A", "TXN_B")).writeAll(Seq(Some(good), Some(good)))
    assert(JdbcSource(url, Seq("""SELECT "id", "v" FROM TXN_A"""))
      .load(spark, Map.empty).head.count() == 3)
    assert(JdbcSource(url, Seq("""SELECT "id", "v" FROM TXN_B"""))
      .load(spark, Map.empty).head.count() == 3)
    // None slots write nothing and are not an error (rs output_sql_none)
    JdbcTxnSink(url, Seq("TXN_A", "TXN_NONE")).writeAll(Seq(Some(good), None))
    assert(JdbcSource(url, Seq("""SELECT "id" FROM TXN_A"""))
      .load(spark, Map.empty).head.count() == 6) // append mode accumulated
    intercept[Throwable](JdbcSource(url, Seq("SELECT * FROM TXN_NONE"))
      .load(spark, Map.empty).head.collect())
  }

  test("golden: frame list to a list of file paths, None slots skipped (rs output_file_multiple_files_with_none)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-golden-filelist").toString
    val frames: Seq[Option[DataFrame]] = Seq(
      Some(Seq(("EU", 300.5), ("US", 120.25)).toDF("region", "sales")),
      None,
      Some(Seq(("APAC", 990.0)).toDF("region", "sales")))
    val paths = Seq(s"$out/first", s"$out/second", s"$out/third")
    paths.zip(frames).foreach { case (p, f) =>
      FileSink(p, format = "jsonl").write(f)
    }
    check(spark.read.json(s"$out/first"),
      s"$golden/output_file_list_none/expected_first.json")
    check(spark.read.json(s"$out/third"),
      s"$golden/output_file_list_none/expected_third.json")
    assert(!new java.io.File(s"$out/second").exists())
  }

  test("golden: multi-output transformer with a None slot — empty version beside data (rs output_table_multiple_with_none)") {
    import graft.td
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-tmn").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "shop", Seq("orders")) { _ =>
      Seq(TableFrame.fromRaw(readCase("table_multi_none", "data.csv", "csv")))
    }
    engine.transformer("split", "shop", Seq("orders"), Seq("high", "low")) { ctx =>
      Seq(ctx.input(0).filter(td.col("amount") >= 20.0), null)
    }
    engine.trigger("pub")
    check(store.scan("shop/high").get.df,
      s"$golden/table_multi_none/expected_high.json")
    // the None slot commits an EMPTY version in the same transaction
    assert(store.scan("shop/low").get.df.count() == 0)
    assert(store.versions("shop", "high").head.transaction ==
      store.versions("shop", "low").head.transaction)
  }

  test("golden: one function joins a table's HEAD against its HEAD~1 (rs input_table_multiple_tables)") {
    import spark.implicits._
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-vj").toString, spark)
    val engine = new FlowEngine(store, spark)
    var rows = Seq(("A", 10.0), ("B", 20.0))
    engine.publisher("pub", "c", Seq("prices")) { _ =>
      Seq(TableFrame.fromRaw(rows.toDF("sku", "price")))
    }
    engine.trigger("pub")
    rows = Seq(("A", 11.0), ("B", 22.0))
    engine.trigger("pub")
    // both versions of the same table as two inputs of one function
    engine.transformer("delta", "c", Seq("prices", "prices@HEAD~1"),
        Seq("price_delta")) { ctx =>
      Seq(ctx.input(0).join(
        ctx.input(1).rename("price" -> "prev_price"), on = Seq("sku")))
    }
    engine.runFunction(engine.fn("delta"), store.newId())
    check(store.scan("c/price_delta").get.df.select("sku", "price", "prev_price"),
      s"$golden/version_join/expected_result.json")
  }

  test("golden: one malformed file inside a matched folder is loud (rs failing_file_in_folder)") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-golden-failfolder").toString
    AvroFiles.write(Seq(("ok", 1)).toDF("k", "v"), s"$stage/good", "overwrite")
    // drop the junk beside the good container files
    val junk = java.nio.file.Paths.get(stage, "good",  "zz-junk.avro")
    Files.copy(java.nio.file.Paths.get(s"$golden/failing_file_in_folder/junk.avro"), junk)
    intercept[Throwable] {
      FileSource(s"$stage/good", "avro").load(spark, Map.empty).head.collect()
    }
  }

  test("golden: diamond trigger graph — one execution, join waits for both branches") {
    import graft.td
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-diamond").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "c", Seq("raw")) { _ =>
      Seq(TableFrame.fromRaw(readCase("trigger_diamond", "raw.csv", "csv")))
    }
    engine.transformer("rev", "c", Seq("raw"), Seq("revenue")) { ctx =>
      Seq(ctx.input(0)
        .with_columns("revenue" -> (td.col("units") * td.col("unit_price")))
        .selectCols("sku", "revenue"))
    }
    engine.transformer("disc", "c", Seq("raw"), Seq("discounted")) { ctx =>
      Seq(ctx.input(0)
        .with_columns("discounted" -> (td.col("units") * td.col("unit_price") * 0.9))
        .selectCols("sku", "discounted"))
    }
    // the join point: triggered by either branch, runs once per execution
    engine.transformer("final", "c", Seq("revenue", "discounted"),
        Seq("combined")) { ctx =>
      Seq(ctx.input(0).join(ctx.input(1), on = Seq("sku")))
    }
    val ran = engine.trigger("pub")
    assert(ran.head == "pub" && ran.count(_ == "final") == 1,
      s"run order: $ran")
    check(store.scan("c/combined").get.df.select("sku", "revenue", "discounted"),
      s"$golden/trigger_diamond/expected_result.json")
    assert(store.versions("c", "combined").size == 1)
  }

  test("golden: overwrite-then-append mixture accumulates from the overwrite point (rs drop/append mixtures)") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-appendmix")}/db;create=true"
    JdbcSink(url, "stock", mode = "overwrite")
      .write(Seq(("OLD", 99)).toDF("sku", "qty"))
    JdbcSink(url, "stock", mode = "overwrite")  // drops OLD
      .write(Seq(("A1", 4)).toDF("sku", "qty"))
    JdbcSink(url, "stock", mode = "append")
      .write(Seq(("B2", 12)).toDF("sku", "qty"))
    JdbcSink(url, "stock", mode = "append")
      .write(Seq(("C3", 1)).toDF("sku", "qty"))
    check(JdbcSource(url, Seq("""SELECT "sku", "qty" FROM stock"""))
      .load(spark, Map.empty).head, s"$golden/jdbc_append_mix/expected_result.json")
  }

  test("golden: csv output with modified separator and null marker round-trips") {
    import spark.implicits._
    import graft.sources.{CsvFormat, FileFormatSpec}
    val out = Files.createTempDirectory("graft-golden-csvsep").toString
    val df = Seq(("osaka", 2691, Option.empty[String]),
        ("lyon", 513, Option("old town")), ("quito", 2011, Option.empty[String]))
      .toDF("city", "pop", "note")
    FileFormatSpec.write(df, s"$out/cities",
      CsvFormat(separator = ";", outputNullValue = Some("NONE")))
    // read back WITHOUT null re-inference: the NONE marker must be visible
    val back = FileFormatSpec.read(spark, s"$out/cities",
      CsvFormat(separator = ";"))
    check(back, s"$golden/csv_output_separator/expected_result.json")
  }

  test("golden: a function returning the wrong output arity fails and commits nothing (rs plugin_wrong_method_overwrite)") {
    import spark.implicits._
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-arity").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub", "c", Seq("t1", "t2")) { _ =>
      Seq(TableFrame.fromRaw(Seq((1, "a")).toDF("id", "v"))) // declared 2, returned 1
    }
    val e = intercept[IllegalArgumentException](engine.trigger("pub"))
    val expectedClass = spark.read.option("multiLine", "true")
      .json(s"$golden/plugin_wrong_arity/expected_error.json")
      .head().getString(0)
    assert(e.getClass.getName.contains(expectedClass))
    assert(store.scan("c/t1").isEmpty && store.scan("c/t2").isEmpty)
  }

  test("golden: headerless csv output and input (rs csv no-header variants)") {
    import spark.implicits._
    import graft.sources.{CsvFormat, FileFormatSpec}
    val out = Files.createTempDirectory("graft-golden-nohdr").toString
    val df = Seq(("saw", 310), ("plane", 240), ("adze", 150)).toDF("tool", "len_mm")
    FileFormatSpec.write(df, s"$out/tools", CsvFormat(outputIncludeHeader = false))
    val back = FileFormatSpec.read(spark, s"$out/tools",
      CsvFormat(inputHasHeader = false))
    // headerless read → positional column names, data rows intact
    assert(back.columns.toSeq == Seq("_c0", "_c1"))
    check(back, s"$golden/csv_headerless/expected_result.json")
  }

  test("golden: chunked avro output lands multiple container files, reads whole") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-golden-avchunk").toString
    val df = (0 until 10).map(i => (i, s"g${i % 3}")).toDF("id", "grp").coalesce(1)
    FileSink(s"$out/rows", format = "avro",
      options = Map("maxRecordsPerFile" -> "4")).write(df)
    assert(new java.io.File(s"$out/rows").listFiles()
      .count(_.getName.endsWith(".avro")) == 3) // 4+4+2
    check(FileSource(s"$out/rows", "avro").load(spark, Map.empty).head,
      s"$golden/output_avro_chunked/expected_result.json")
  }

  test("golden: delete table then re-publish starts a fresh version history") {
    import spark.implicits._
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-delrec").toString, spark)
    val engine = new FlowEngine(store, spark)
    var rows = Seq(("O1", 1), ("O2", 2))
    engine.publisher("pub", "c", Seq("stock")) { _ =>
      Seq(TableFrame.fromRaw(rows.toDF("sku", "qty")))
    }
    engine.trigger("pub")
    engine.trigger("pub")
    assert(store.versions("c", "stock").size == 2)
    assert(store.deleteTable("c", "stock"))
    assert(store.scan("c/stock").isEmpty && store.versions("c", "stock").isEmpty)
    // re-publish: history restarts at one version, new data served
    rows = Seq(("N1", 7), ("N2", 3))
    engine.trigger("pub")
    assert(store.versions("c", "stock").size == 1)
    check(store.scan("c/stock").get.df,
      s"$golden/table_delete_recreate/expected_result.json")
  }

  test("golden: replace_partitions rewrites only incoming partitions (rs catalog_partition)") {
    import spark.implicits._
    val table = s"golden_events_${System.nanoTime()}"
    val sink = graft.sources.CatalogSink(table,
      ifTableExists = "replace_partitions", partitionBy = Seq("day"))
    sink.write(Seq(("2024-01-01", 1, "a"), ("2024-01-01", 2, "b"),
      ("2024-01-02", 3, "c")).toDF("day", "id", "v"))
    // second write touches only day=2024-01-02; day=01 rows must survive
    sink.write(Seq(("2024-01-02", 9, "z")).toDF("day", "id", "v"))
    check(spark.table(table),
      s"$golden/catalog_replace_partitions/expected_result.json")
    spark.sql(s"DROP TABLE $table")
  }

  test("golden: parquet wildcard binds exactly the matched frames, sibling excluded (rs input_file_parquet_wildcard)") {
    // parquet twin of file_wildcard: source_*.parquet binds a LIST of
    // frames (the reference function raises unless len == 2; another_file
    // .parquet sits beside them and must NOT match), joined inner on ID.
    // Binary inputs are staged from literal rows, per the harness contract.
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-golden-pqwild").toString
    Seq((11, "anvil"), (12, "brace"), (13, "clamp"))
      .toDF("ID", "Name").write.parquet(s"$stage/source_1.parquet")
    Seq((11, 4), (12, 9), (14, 2))
      .toDF("ID", "Qty").write.parquet(s"$stage/source_2.parquet")
    Seq((99, "must-not-match"))
      .toDF("ID", "Name").write.parquet(s"$stage/another_file.parquet")
    val dfs = FileSource(s"$stage/source_*.parquet", "parquet")
      .load(spark, Map.empty)
    assert(dfs.length == 2, s"expected exactly 2 matched frames, got ${dfs.length}")
    val joined = TableFrame.fromRaw(dfs.head)
      .join(TableFrame.fromRaw(dfs(1)), on = Seq("ID"), how = "inner")
    check(joined.df, s"$golden/parquet_wildcard/expected_result.json")
  }

  test("golden: version RANGE input rides beside a plain input in one function (rs input_table_multiple_tables)") {
    // the reference function takes `headers` and `items@HEAD^..HEAD` (a
    // LIST of versions) and returns (headers, concat(items-list)); a range
    // scan here is the vertical union of the versions it covers, so the
    // concat is the binding itself
    import spark.implicits._
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-vrange").toString, spark)
    val engine = new FlowEngine(store, spark)
    engine.publisher("pub_h", "c", Seq("headers")) { _ =>
      Seq(TableFrame.fromRaw(Seq(("inv-1", "acme"), ("inv-2", "globex"))
        .toDF("invoice", "customer")))
    }
    var items = Seq(("inv-1", "widget", 25.0), ("inv-1", "gadget", 40.0))
    engine.publisher("pub_i", "c", Seq("items")) { _ =>
      Seq(TableFrame.fromRaw(items.toDF("invoice", "item", "amount")))
    }
    engine.trigger("pub_h")
    engine.trigger("pub_i") // items v1 (HEAD^)
    items = Seq(("inv-2", "sprocket", 12.5), ("inv-2", "flange", 99.0))
    engine.trigger("pub_i") // items v2 (HEAD)
    engine.transformer("merge", "c",
        Seq("headers", "items@HEAD^..HEAD"), Seq("out_h", "out_i")) { ctx =>
      Seq(ctx.input(0), ctx.input(1))
    }
    engine.runFunction(engine.fn("merge"), store.newId())
    check(store.scan("c/out_h").get.df,
      s"$golden/table_version_range/expected_headers.json")
    check(store.scan("c/out_i").get.df,
      s"$golden/table_version_range/expected_items.json")
  }

  test("golden: destination plugin streams the whole result set in one call (rs output_plugin)") {
    // the reference plugin's stream(working_dir, *results) sinks results[0]
    // as ndjson; the subscriber body is drop_nulls over the fitness csv
    import graft.sources.{DestinationPlugin, FileSink, ResultSlot}
    val out = Files.createTempDirectory("graft-golden-outplugin").toString
    val plugin = new DestinationPlugin {
      def stream(workingDir: String, results: Seq[ResultSlot]): Unit =
        results.head match {
          case ResultSlot.One(df) => FileSink(s"$out/sunk", format = "jsonl").write(df)
          case other => fail(s"expected One, got $other")
        }
    }
    val result = TableFrame.fromRaw(
      readCase("output_plugin", "data.csv", "csv")).drop_nulls()
    plugin.stream(out, Seq(ResultSlot.One(result.df)))
    check(spark.read.json(s"$out/sunk"),
      s"$golden/output_plugin/expected_result.json")
  }

  test("golden: destination plugin fans two result slots to two files (rs output_plugin_multiple_outputs)") {
    import spark.implicits._
    import graft.sources.{DestinationPlugin, FileSink, ResultSlot}
    val out = Files.createTempDirectory("graft-golden-outplugin2").toString
    val plugin = new DestinationPlugin {
      def stream(workingDir: String, results: Seq[ResultSlot]): Unit = {
        val Seq(ResultSlot.One(a), ResultSlot.One(b)) = results
        FileSink(s"$out/first", format = "jsonl").write(a)
        FileSink(s"$out/second", format = "jsonl").write(b)
      }
    }
    plugin.stream(out, Seq(
      ResultSlot.One(Seq(("osaka", 2691), ("lyon", 513)).toDF("city", "pop")),
      ResultSlot.One(Seq(("osaka", "large"), ("lyon", "small")).toDF("city", "tier"))))
    check(spark.read.json(s"$out/first"),
      s"$golden/output_plugin_multi/expected_first.json")
    check(spark.read.json(s"$out/second"),
      s"$golden/output_plugin_multi/expected_second.json")
  }

  test("golden: None slots REACH the destination plugin, not skipped (rs output_plugin_with_none/_multiple_with_none)") {
    // the reference's with_none plugins assert their slots ARE None — a
    // per-slot Sink skips None, but a plugin is handed the whole result
    // set and decides; both single- and double-None shapes in one pass
    import graft.sources.{DestinationPlugin, ResultSlot}
    var seen: Seq[Seq[graft.sources.ResultSlot]] = Nil
    val plugin = new DestinationPlugin {
      def stream(workingDir: String, results: Seq[ResultSlot]): Unit = {
        results.foreach(r => assert(r == ResultSlot.NoneSlot,
          s"plugin slot should be None, got $r"))
        seen = seen :+ results
      }
    }
    plugin.stream("/tmp", Seq(ResultSlot.NoneSlot))
    plugin.stream("/tmp", Seq(ResultSlot.NoneSlot, ResultSlot.NoneSlot))
    assert(seen.map(_.length) == Seq(1, 2))
  }

  test("golden: explicit JDBC driver class provided and honored (rs output_sql_driver_provided)") {
    import spark.implicits._
    import graft.sources.{JdbcSink, JdbcSource}
    // positive twin of wrong_driver_fails: the reference URL names its
    // driver (mysql+mysqlconnector); here the Derby embedded driver is
    // passed explicitly and the write round-trips
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-drv")}/db;create=true"
    JdbcSink(url, "stock", mode = "append",
        properties = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      .write(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("sku", "qty"))
    val back = JdbcSource(url, Seq("""SELECT "sku", "qty" FROM stock"""))
      .load(spark, Map.empty).head
    check(back, s"$golden/sql_output_driver/expected_result.json")
  }

  test("golden: one frame fans out to a LIST of file destinations (rs output_file_multiple_files)") {
    // the reference subscriber returns (df, df) against a two-path
    // LocalFileDestination: both paths receive the full frame
    import spark.implicits._
    val out = Files.createTempDirectory("graft-golden-multifile").toString
    val df = Seq(("osaka", 2691), ("lyon", 513)).toDF("city", "pop")
    val paths = Seq(s"$out/first", s"$out/second")
    paths.foreach(p => FileSink(p, format = "jsonl").write(df))
    paths.foreach(p => check(spark.read.json(p),
      s"$golden/output_multiple_files/expected_result.json"))
  }

  test("golden: initial_last_modified selects one file; empty second run falls back (rs input_s3_select_datetime)") {
    // the reference publisher handles all three listing outcomes: exactly
    // one file newer than initial_last_modified (drop_nulls it), none
    // (publish the literal fallback frame {"answer": 42} — its
    // expected_result_second_run.json), several (raise). Run 1 must see
    // ONLY the newer file (the initial watermark excludes the old one,
    // unlike file_incremental, which starts unfiltered); run 2 sees
    // nothing new and publishes the fallback.
    import graft.sources.FileSource
    import spark.implicits._
    val in = Files.createTempDirectory("graft-golden-seldt")
    def stage(name: String, at: java.time.Instant): Unit = {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$golden/select_datetime_runs/$name"),
        in.resolve(name))
      Files.setLastModifiedTime(in.resolve(name),
        java.nio.file.attribute.FileTime.from(at))
    }
    stage("data_old.csv", java.time.Instant.parse("2024-09-04T00:00:00Z"))
    stage("data_new.csv", java.time.Instant.parse("2024-09-06T00:00:00Z"))
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-seldt-store").toString, spark)
    val engine = new FlowEngine(store, spark)
    val src = FileSource(s"$in/*.csv", "csv",
      modifiedAfter = Some("2024-09-05T01:01:00.01Z"))
    engine.publisher("pub", "c", Seq("t")) { ctx =>
      val dfs = src.load(spark, ctx.offsets)
      src.nextOffsets(dfs).foreach { case (k, v) => ctx.setOffset(k, v) }
      dfs match {
        case Seq(one) => Seq(TableFrame.fromRaw(one).drop_nulls())
        case Seq()    => Seq(TableFrame.fromRaw(Seq(42L).toDF("answer")))
        case many => throw new IllegalStateException(
          s"Expected exactly one file or none to be imported, ${many.length} found instead.")
      }
    }
    engine.trigger("pub")
    check(store.scan("c/t").get.df,
      s"$golden/select_datetime_runs/expected_result.json")
    engine.trigger("pub") // nothing new: the fallback frame publishes
    check(store.scan("c/t").get.df,
      s"$golden/select_datetime_runs/expected_result_second_run.json")
  }

  test("golden: typed CSVFormat OBJECT on an extension-less file (rs input_s3_explicit_format_object)") {
    // the string-format twin is `explicit_format`; here the format is the
    // typed object with its defaults (td.CSVFormat()), proving the object
    // surface carries the same read behavior field-for-field
    import graft.sources.{CsvFormat, FileFormatSpec}
    val df = FileFormatSpec.read(spark,
      s"$golden/explicit_format_object/data_no_extension", CsvFormat())
    check(TableFrame.fromRaw(df).drop_nulls().df,
      s"$golden/explicit_format_object/expected_result.json")
  }

  test("golden: retargeted uri re-derives the implicit format (rs input_s3_modified_uri)") {
    // the reference builds an S3Source for data.parquet then mutates
    // source.uri to data.csv — the uri setter re-derives the implicit
    // format, so the read parses CSV (file_inputs.py @uri.setter)
    import graft.sources.FileSource
    val src = FileSource.auto("/nonexistent/staging/data.parquet")
    assert(src.format == "parquet")
    val moved = src.retargeted(s"$golden/modified_uri/data.csv")
    assert(moved.format == "csv")
    val df = moved.load(spark, Map.empty).head
    check(TableFrame.fromRaw(df).drop_nulls().df,
      s"$golden/modified_uri/expected_result.json")
    // an extension the reference cannot derive fails loudly
    intercept[IllegalArgumentException](FileSource.auto("/x/data.xlsx"))
  }

  test("golden: catalog sink appends into an existing table (rs output_s3_catalog_append)") {
    // if_table_exists="append" against a pre-existing catalog table: the
    // new rows join the old ones, schema unchanged (session catalog
    // standing in for Glue — CatalogSpec proves the strategy matrix; this
    // corpus case pins the resulting table CONTENT)
    import spark.implicits._
    val table = s"golden_append_${System.nanoTime()}"
    graft.sources.CatalogSink(table).write(
      Seq(("quito", 2011)).toDF("city", "pop"))
    graft.sources.CatalogSink(table, ifTableExists = "append").write(
      FileSource(s"$golden/catalog_append/data.csv", "csv")
        .load(spark, Map.empty).head)
    check(spark.table(table), s"$golden/catalog_append/expected_result.json")
    spark.sql(s"DROP TABLE $table")
  }

  test("golden: strict schema strategy appends same-schema rows, rejects drift (rs output_s3_catalog_schema_strategy)") {
    import spark.implicits._
    val table = s"golden_strict_${System.nanoTime()}"
    graft.sources.CatalogSink(table).write(Seq(("bolt", 1)).toDF("sku", "qty"))
    val sink = graft.sources.CatalogSink(table, ifTableExists = "append",
      schemaStrategy = "strict")
    sink.write(FileSource(s"$golden/catalog_schema_strategy/data.csv", "csv")
      .load(spark, Map.empty).head)
    check(spark.table(table),
      s"$golden/catalog_schema_strategy/expected_result_catalog.json")
    // drift under strict: a new incoming column is rejected loudly
    val ex = intercept[IllegalArgumentException] {
      sink.write(Seq(("nut", 9, "steel")).toDF("sku", "qty", "material"))
    }
    assert(ex.getMessage.contains("strict schema"), ex.getMessage)
    spark.sql(s"DROP TABLE $table")
  }

  test("golden: environment-resolved credentials reach the connection (rs input_s3_environment_secret)") {
    // the reference resolves EnvironmentSecret lazily in the backend
    // (_secret.py:262-275); here the same pair flows into a JDBC roundtrip
    // (embedded Derby accepts any user/password — what's proven is that
    // resolution happens at CONNECTION time and the properties carry the
    // resolved values, plus the loud missing-variable failure)
    import spark.implicits._
    import graft.sources.{EnvironmentSecret, JdbcSink, JdbcSource, Secret,
      UserPasswordCredentials}
    val creds = UserPasswordCredentials(
      Secret("app"), EnvironmentSecret("HOME"))
    val props = creds.jdbcProperties
    assert(props("user") == "app" && props("password") == sys.env("HOME"))
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-golden-envsec")}/db;create=true"
    JdbcSink(url, "stock", mode = "append", properties = props)
      .write(Seq(("widget", 4), ("gear", 7)).toDF("sku", "qty"))
    val back = JdbcSource(url, Seq("""SELECT "sku", "qty" FROM stock"""),
        properties = props)
      .load(spark, Map.empty).head
    check(back, s"$golden/environment_secret/expected_result.json")
    // a missing variable fails loudly at resolution, not silently empty
    val missing = intercept[NoSuchElementException](
      EnvironmentSecret("GRAFT_NO_SUCH_VAR_42").secretValue)
    assert(missing.getMessage.contains("GRAFT_NO_SUCH_VAR_42"))
    // secrets never print their material
    assert(!creds.toString.contains("app") ||
      creds.toString.contains("DirectSecret(***)"))
    assert(!graft.sources.DirectSecret("hunter2").toString.contains("hunter2"))
    // HashiCorp env contract (rs input_s3_hashicorp_secret): without
    // TDS_<vault>_URL/TOKEN resolution fails loudly naming the variable
    val hv = intercept[Exception](
      graft.sources.HashiCorpSecret("path/to", "key", "MYVAULT").secretValue)
    def chainHas(t: Throwable, s: String): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains(s)) || chainHas(t.getCause, s))
    assert(chainHas(hv, "TDS_MYVAULT_URL"), hv.toString)
    intercept[IllegalArgumentException](
      graft.sources.HashiCorpSecret("p", "n", "9bad"))
  }

  test("golden: basic source plugin stages a file and feeds one table (rs input_plugin)") {
    // the reference Importer(folder, file) copies source_1.csv into the
    // plugin working dir and the engine loads it; another_file.csv in the
    // same folder must NOT leak in (the plugin picks its file, not a glob)
    import graft.sources.FileSource
    val store = new TableStore(
      Files.createTempDirectory("graft-golden-pbasic").toString, spark)
    val engine = new FlowEngine(store, spark)
    val src = new graft.sources.Source {
      override def load(s: org.apache.spark.sql.SparkSession,
          offsets: Map[String, String]) = {
        val work = Files.createTempDirectory("graft-plugin-work")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$golden/input_plugin_basic/source_1.csv"),
          work.resolve("staged.csv"))
        FileSource(s"$work/staged.csv", "csv").load(s, Map.empty)
      }
    }
    engine.publisher("pub", "c", Seq("t")) { ctx =>
      src.load(spark, ctx.offsets).map(TableFrame.fromRaw(_))
    }
    engine.trigger("pub")
    check(store.scan("c/t").get.df,
      s"$golden/input_plugin_basic/expected_result.json")
  }

  test("golden: single parquet file destination round-trips drop_nulls (rs output_file)") {
    // the reference subscriber writes output_file_parquet.parquet via
    // LocalFileDestination; the parquet read-back equals the dropped frame
    val out = Files.createTempDirectory("graft-golden-outparquet").toString
    val result = TableFrame.fromRaw(
      readCase("output_parquet", "data.csv", "csv")).drop_nulls()
    FileSink(s"$out/output_file_parquet.parquet", format = "parquet")
      .write(result.df)
    check(spark.read.parquet(s"$out/output_file_parquet.parquet"),
      s"$golden/output_parquet/expected_result.json")
  }
}

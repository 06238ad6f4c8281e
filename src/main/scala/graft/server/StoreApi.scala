package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.util.Using

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

import graft.flow.{ExecutionLog, ExecutionRecord, FlowEngine}
import graft.store.{TableRef, TableStore}

/** Minimal HTTP serving layer over a [[TableStore]] — the library-side
  * analog of the reference's table API surface (api/apiserver.py:936-1013;
  * served by api/tabsdata_server.py:2476-2527):
  *
  *   - `GET    /collections/{c}/tables`                    — list (JSON)
  *   - `GET    /collections/{c}/tables/{t}/schema[?at=ms]` — schema (JSON)
  *   - `GET    /collections/{c}/tables/{t}/sample?offset=&len=[&at=ms]`
  *     — a bounded row slice as parquet bytes (the reference's sample
  *     endpoint also returns parquet content)
  *   - `GET    /collections/{c}/tables/{t}/download[?at=ms]` — full parquet
  *   - `DELETE /collections/{c}/tables/{t}`                — drop the table
  *   - `GET    /collections`                               — collections
  *   - `GET    /collections/{c}/tables/{t}/data-versions`  — version log
  *   - `POST   /collections/{c}/tables/{t}/restore?to=ref` — metadata-only
  *     rollback ([[graft.store.TableStore.restore]])
  *   - `GET    /transactions`                              — committed txns
  *   - `GET    /status`                                    — health probe
  *   - `GET    /collections/{c}/functions` and
  *     `POST   /collections/{c}/functions/{f}/execute`     — list/trigger
  *     registered flow functions when a [[FlowEngine]] is attached
  *   - `GET    /executions`, `GET /function_runs`,
  *     `GET    /collections/{c}/functions/{f}/history`     — the run
  *     journal ([[graft.flow.ExecutionLog]]), incl. failed runs
  *
  * The `{t}` segment accepts the store's version grammar (`t@HEAD~2`), and
  * `at` is the reference's epoch-millis trigger-time cutoff.
  *
  * Scale note: schema and list are served from the version log alone (no
  * Spark job, no file reads). `sample` runs a bounded `offset/limit` scan.
  * `download` funnels the whole table through one HTTP response by design —
  * that is what a download endpoint is — while the data path for engines
  * stays the distributed parquet under the store root; a cluster consumer
  * should read those files, not this endpoint. */
final class StoreApi(store: TableStore, engine: Option[FlowEngine] = None,
    port: Int = 0, authToken: Option[String] = None) {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  Seq("/collections", "/transactions", "/status", "/executions", "/function_runs")
    .foreach(p => server.createContext(p, (ex: HttpExchange) => safely(ex)(route(ex))))
  // a small fixed pool, not setExecutor(null): on the dispatch thread one
  // slow `download` (a full-table parquet rewrite) serializes every other
  // endpoint behind it, including the `/status` health probe. Spark is
  // thread-safe across concurrent actions; 4 daemon workers keep probes and
  // listings responsive without inviting unbounded concurrent table scans.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    (r: Runnable) => {
      val t = new Thread(r, "graft-store-api"); t.setDaemon(true); t
    })
  server.setExecutor(pool)

  def boundPort: Int = server.getAddress.getPort
  def start(): Unit = server.start()
  def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }

  private def safely(ex: HttpExchange)(body: => Unit): Unit =
    try { if (authorized(ex)) body else respondJson(ex, 401,
      """{"error":"missing or invalid bearer token"}""") }
    catch {
      case e: IllegalArgumentException => respondJson(ex, 400, errorJson(e))
      case e: Throwable => respondJson(ex, 500, errorJson(e))
    } finally ex.close()

  /** Static bearer-token auth, the minimal port of the reference
    * apiserver's token layer (api/apiserver.py users/roles/tokens — the
    * full login/refresh flow is out of scope for a query-capability port).
    * Unset token → open server (the localhost dev default); set → every
    * endpoint except the `/status` health probe requires
    * `Authorization: Bearer <token>`, compared constant-time. */
  private def authorized(ex: HttpExchange): Boolean = authToken match {
    case None => true
    case Some(_) if ex.getRequestURI.getPath.stripSuffix("/") == "/status" => true
    case Some(tok) =>
      val got = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      val want = s"Bearer $tok"
      java.security.MessageDigest.isEqual(
        got.getBytes(StandardCharsets.UTF_8), want.getBytes(StandardCharsets.UTF_8))
  }

  private def errorJson(e: Throwable): String = {
    val n = TableStore.jsonMapper.createObjectNode()
    n.put("error", s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    TableStore.jsonMapper.writeValueAsString(n)
  }

  private def route(ex: HttpExchange): Unit = {
    val segs = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/").split("/").toSeq
    val q = query(ex)
    (ex.getRequestMethod, segs) match {
      case ("GET", Seq("status")) =>
        respondJson(ex, 200, """{"data":"OK"}""")

      case ("GET", Seq("collections")) =>
        val root = TableStore.jsonMapper.createObjectNode()
        val data = root.putArray("data")
        store.listCollections().foreach(c => data.addObject().put("name", c))
        respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(root))

      case ("GET", Seq("transactions")) =>
        val root = TableStore.jsonMapper.createObjectNode()
        val data = root.putArray("data")
        store.listTransactions().foreach(t => data.addObject().put("id", t))
        respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(root))

      case ("GET", Seq("function_runs")) =>
        respondRuns(ex, ExecutionLog.read(store.root))

      case ("GET", Seq("executions")) =>
        // one row per trigger: id + rollup status (failed if any run failed)
        val runs = ExecutionLog.read(store.root)
        val root = TableStore.jsonMapper.createObjectNode()
        val data = root.putArray("data")
        runs.groupBy(_.execution).toSeq
          .sortBy { case (_, rs) => rs.map(_.triggeredOn).min }
          .foreach { case (id, rs) =>
            data.addObject().put("id", id)
              .put("status", if (rs.exists(_.status == "failed")) "failed" else "done")
              .put("triggered_on", rs.map(_.triggeredOn).min)
              .put("function_runs", rs.size)
          }
        respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(root))

      case ("GET", Seq("collections", c, "functions", f, "history")) =>
        respondRuns(ex, ExecutionLog.read(store.root)
          .filter(r => r.collection == c && r.function == f))

      case ("GET", Seq("collections", c, "tables", t, "data-versions")) =>
        val vs = store.versions(c, t)
        if (vs.isEmpty) respondJson(ex, 404, s"""{"error":"table not found: $c/$t"}""")
        else {
          val root = TableStore.jsonMapper.createObjectNode()
          val data = root.putArray("data")
          vs.foreach { v =>
            data.addObject().put("id", v.id).put("execution", v.execution)
              .put("transaction", v.transaction).put("created_at", v.timestampMs)
              .put("rows", v.rows)
          }
          respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(root))
        }

      case ("GET", Seq("collections", c, "functions")) =>
        engine match {
          case None => respondJson(ex, 404, """{"error":"no flow engine attached"}""")
          case Some(eng) =>
            val root = TableStore.jsonMapper.createObjectNode()
            val data = root.putArray("data")
            eng.functionsIn(c).foreach { f =>
              val o = data.addObject().put("name", f.name)
                .put("role", f.role.toString.toLowerCase)
              val outs = o.putArray("tables")
              f.outputs.foreach(outs.add)
            }
            respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(root))
        }

      case ("POST", Seq("collections", c, "functions", f, "execute")) =>
        engine match {
          case None => respondJson(ex, 404, """{"error":"no flow engine attached"}""")
          case Some(eng) if !eng.functionsIn(c).exists(_.name == f) =>
            respondJson(ex, 404, s"""{"error":"function not found: $c/$f"}""")
          case Some(eng) =>
            val ran = eng.trigger(f)
            val root = TableStore.jsonMapper.createObjectNode()
            val data = root.putArray("data")
            ran.foreach(data.add)
            respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(root))
        }

      case ("GET", Seq("collections", c, "tables")) =>
        val arr = TableStore.jsonMapper.createObjectNode()
        val data = arr.putArray("data")
        store.listTables(c).foreach(t => data.addObject().put("name", t))
        respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(arr))

      case ("GET", Seq("collections", c, "tables", t, "schema")) =>
        store.schema(TableRef.parse(t, c), q.get("at").map(_.toLong)) match {
          case None => respondJson(ex, 404, s"""{"error":"table not found: $c/$t"}""")
          case Some(s) =>
            val root = TableStore.jsonMapper.createObjectNode()
            val fields = root.putObject("data").putArray("fields")
            s.fields.foreach { f =>
              fields.addObject().put("name", f.name)
                .put("type", f.dataType.typeName).put("nullable", f.nullable)
            }
            respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(root))
        }

      case ("GET", Seq("collections", c, "tables", t, "sample")) =>
        val offset = q.get("offset").map(_.toInt).getOrElse(0)
        val len = q.get("len").map(_.toInt).getOrElse(100)
        require(offset >= 0 && len >= 0, s"offset/len must be >= 0, got $offset/$len")
        store.sample(TableRef.parse(t, c), offset, len, q.get("at").map(_.toLong)) match {
          case None => respondJson(ex, 404, s"""{"error":"table not found: $c/$t"}""")
          case Some(df) => respondParquet(ex, df)
        }

      case ("GET", Seq("collections", c, "tables", t, "download")) =>
        scanAt(c, t, q) match {
          case None => respondJson(ex, 404, s"""{"error":"table not found: $c/$t"}""")
          case Some(df) => respondParquet(ex, df)
        }

      case ("POST", Seq("collections", c, "tables", t, "restore")) =>
        // metadata-only rollback: ?to=<selector> (HEAD~n / fixed id)
        q.get("to") match {
          case None => respondJson(ex, 400,
            """{"error":"missing required query parameter: to"}""")
          case Some(ref) =>
            // a selector that does not PARSE is the caller's malformed
            // request (400); a selector that parses but resolves to no
            // version is a missing resource (404) — and either message
            // embeds the user-supplied ref, so it must be JSON-escaped
            val parseError =
              try { graft.store.Version.parse(ref); None }
              catch { case iae: IllegalArgumentException => Some(iae) }
            parseError match {
              case Some(iae) => respondJson(ex, 400,
                s"""{"error":${jsonString(iae.getMessage)}}""")
              case None =>
                try store.restore(c, t, ref) match {
                  case Some(e) => respondJson(ex, 200,
                    s"""{"data":{"version":"${e.id}","dataOf":"${e.dataRef}"}}""")
                  case None => respondJson(ex, 200,
                    """{"data":"noop: HEAD already reads that version"}""")
                } catch {
                  case iae: IllegalArgumentException => respondJson(ex, 404,
                    s"""{"error":${jsonString(iae.getMessage)}}""")
                }
            }
        }

      case ("DELETE", Seq("collections", c, "tables", t)) =>
        if (store.deleteTable(c, t)) respondJson(ex, 200, """{"data":"deleted"}""")
        else respondJson(ex, 404, s"""{"error":"table not found: $c/$t"}""")

      case ("GET", _) => respondJson(ex, 404, """{"error":"no such endpoint"}""")
      case (m, _) => respondJson(ex, 405, s"""{"error":"method not allowed: $m"}""")
    }
  }

  private def respondRuns(ex: HttpExchange, runs: Seq[ExecutionRecord]): Unit = {
    val root = TableStore.jsonMapper.createObjectNode()
    val data = root.putArray("data")
    runs.foreach { r =>
      val o = data.addObject().put("execution", r.execution)
        .put("function", r.function).put("collection", r.collection)
        .put("status", r.status).put("triggered_on", r.triggeredOn)
        .put("duration_ms", r.durationMs)
      r.error.foreach(o.put("error", _))
    }
    respondJson(ex, 200, TableStore.jsonMapper.writeValueAsString(root))
  }

  private def scanAt(c: String, t: String, q: Map[String, String]): Option[DataFrame] =
    store.scan(TableRef.parse(t, c), q.get("at").map(_.toLong)).map(_.df)

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  /** A string as a JSON string literal (quoted + escaped) — any text that
    * can embed user input must pass through here, or a quote/backslash in
    * the input produces a malformed response body. */
  private def jsonString(s: String): String =
    TableStore.jsonMapper.writeValueAsString(
      Option(s).getOrElse("(no message)"))

  private def respondJson(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    Using.resource(ex.getResponseBody)(_.write(bytes))
  }

  /** Serve a frame as one parquet file (the response is one byte stream, so
    * the single-file rewrite is inherent to the endpoint, not a plan flaw). */
  private def respondParquet(ex: HttpExchange, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("graft-api-parquet")
    try {
      val out = tmp.resolve("out").toString
      df.coalesce(1).write.parquet(out)
      val part = Using.resource(Files.list(Path.of(out)))(
        _.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")))
        .getOrElse(throw new IllegalStateException("no parquet part written"))
      val bytes = Files.readAllBytes(part)
      ex.getResponseHeaders.set("Content-Type", "application/vnd.apache.parquet")
      ex.sendResponseHeaders(200, bytes.length)
      Using.resource(ex.getResponseBody)(_.write(bytes))
    } finally TableStore.deleteTree(tmp)
  }
}

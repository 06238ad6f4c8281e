package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HashiCorpSecret, SecretEnv}

/** The HashiCorp KV-v2 HAPPY path — the one branch of the secrets surface
  * the env-contract tests (GoldenSpec environment_secret) cannot reach
  * without a vault. A loopback JDK HttpServer plays the vault: it answers
  * `GET /v1/secret/data/<path>` with the KV-v2 envelope and records the
  * request, so the reference semantics (`_secret.py:125-170`: URL from
  * `TDS_<vault>_URL`, `X-Vault-Token` header, optional
  * `X-Vault-Namespace`, value at `data.data.<name>`) are asserted
  * end-to-end with zero network egress. */
class SecretsSpec extends AnyFunSuite {

  private def withVault(status: Int, body: String)(
      f: (String, () => Map[String, String], () => String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenHeaders = Map.empty[String, String]
    @volatile var seenPath = ""
    server.createContext("/", (ex: HttpExchange) => {
      seenPath = ex.getRequestURI.getPath
      seenHeaders = {
        val h = ex.getRequestHeaders
        import scala.jdk.CollectionConverters._
        // lowercase keys: the JDK server normalizes header-name casing
        h.keySet().asScala.map(k => k.toLowerCase -> h.getFirst(k)).toMap
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}",
      () => seenHeaders, () => seenPath)
    finally {
      server.stop(0)
      SecretEnv.overrides = Map.empty
    }
  }

  private val envelope =
    """{"request_id":"x","data":{"data":{"db_password":"s3cr3t","other":"y"},
      |"metadata":{"version":2}}}""".stripMargin

  test("KV-v2 read: URL/token env contract, data.data.<name> extraction") {
    withVault(200, envelope) { (url, headers, path) =>
      // trailing slash must not double up in the composed URL
      SecretEnv.overrides = Map(
        "TDS_HASHICORP_URL" -> (url + "/"),
        "TDS_HASHICORP_TOKEN" -> "tok-123")
      val got = HashiCorpSecret("team/app", "db_password").secretValue
      assert(got == "s3cr3t")
      assert(path() == "/v1/secret/data/team/app", path())
      assert(headers().get("x-vault-token").contains("tok-123"), headers())
      assert(!headers().contains("x-vault-namespace"), headers())
    }
  }

  test("KV-v2 read: namespace header sent exactly when TDS_<vault>_NAMESPACE is set") {
    withVault(200, envelope) { (url, headers, _) =>
      SecretEnv.overrides = Map(
        "TDS_MYVAULT_URL" -> url,
        "TDS_MYVAULT_TOKEN" -> "t2",
        "TDS_MYVAULT_NAMESPACE" -> "ns1")
      val got = HashiCorpSecret("team/app", "other", "MYVAULT").secretValue
      assert(got == "y")
      assert(headers().get("x-vault-namespace").contains("ns1"), headers())
    }
  }

  test("KV-v2 read: a missing field at the path fails loudly (reference message)") {
    withVault(200, envelope) { (url, _, _) =>
      SecretEnv.overrides = Map(
        "TDS_HASHICORP_URL" -> url, "TDS_HASHICORP_TOKEN" -> "t")
      val ex = intercept[IllegalStateException](
        HashiCorpSecret("team/app", "no_such_field").secretValue)
      assert(ex.getMessage.contains("Hashicorp Vault"), ex.getMessage)
      assert(ex.getCause.getMessage.contains("no_such_field"), ex.getCause.getMessage)
    }
  }

  test("KV-v2 read: a non-200 vault answer fails loudly with the status") {
    withVault(403, """{"errors":["permission denied"]}""") { (url, _, _) =>
      SecretEnv.overrides = Map(
        "TDS_HASHICORP_URL" -> url, "TDS_HASHICORP_TOKEN" -> "bad")
      val ex = intercept[IllegalStateException](
        HashiCorpSecret("team/app", "db_password").secretValue)
      assert(ex.getCause.getMessage.contains("403"), ex.getCause.getMessage)
    }
  }

  test("env-contract failure path is unchanged by the override seam") {
    // no overrides set: the missing-variable error still names the var
    val ex = intercept[Exception](
      HashiCorpSecret("p", "n", "NOVAULT42").secretValue)
    def chainHas(t: Throwable, s: String): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains(s)) ||
        chainHas(t.getCause, s))
    assert(chainHas(ex, "TDS_NOVAULT42_URL"), ex.toString)
  }
}

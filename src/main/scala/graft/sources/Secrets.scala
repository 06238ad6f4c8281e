package graft.sources

/** Secrets and credentials, porting the reference's public API surface
  * (`client/td-sdk/tabsdata/_secret.py`: DirectSecret :172,
  * EnvironmentSecret :221, HashiCorpSecret :51; `_credentials.py`:
  * UserPasswordCredentials :295, S3AccessKeyCredentials :205,
  * AzureAccountKeyCredentials :37).
  *
  * A Secret names WHERE a value lives; resolution happens lazily at
  * connection time (`secretValue`), never at construction — flow
  * definitions can be built and shipped without the secret material (the
  * reference's bundle model: `_to_dict` serializes the pointer, and only
  * the backend execution calls `secret_value`). `toString` never prints
  * the material on any variant.
  */
sealed trait Secret {
  /** Resolve the secret NOW. Loud failure when the backing store cannot
    * produce it — never a silent empty string. */
  def secretValue: String
}

/** Environment indirection for the env-backed secrets: resolution reads
  * THROUGH the (normally empty) test override map before the real
  * process environment. Production never sets overrides, so the
  * reference's `TDS_*` env contract is byte-identical; the seam exists
  * because a JVM cannot mutate its own environment, and the KV-v2 happy
  * path (loopback vault stub on an ephemeral port) needs a URL that is
  * only known at test runtime. */
private[graft] object SecretEnv {
  @volatile private[graft] var overrides: Map[String, String] = Map.empty
  def get(name: String): Option[String] =
    overrides.get(name).orElse(sys.env.get(name))
}

object Secret {
  /** The reference's `build_secret`: a plain string becomes a
    * DirectSecret (`_secret.py:279-292`). */
  def apply(value: String): Secret = DirectSecret(value)
}

/** A literal value carried in the definition itself. */
final case class DirectSecret(value: String) extends Secret {
  override def secretValue: String = value
  override def toString: String = "DirectSecret(***)"
}

/** A value read from an environment variable at resolution time
  * (`_secret.py:262-275`: missing variable is an error, not None). */
final case class EnvironmentSecret(environmentVariableName: String) extends Secret {
  override def secretValue: String =
    sys.env.getOrElse(environmentVariableName,
      throw new NoSuchElementException(
        s"Environment variable $environmentVariableName not found."))
  override def toString: String = s"EnvironmentSecret($environmentVariableName)"
}

/** A value held in HashiCorp Vault (KV v2). The vault's URL/token (and
  * optional namespace) come from `TDS_<vault>_URL` / `TDS_<vault>_TOKEN` /
  * `TDS_<vault>_NAMESPACE` environment variables, with `vault` defaulting
  * to HASHICORP — the same contract as `_secret.py:74-76,125-170`.
  * Resolution is one KV-v2 REST read (`GET <url>/v1/secret/data/<path>`,
  * `X-Vault-Token` header) answered from `data.data.<name>`. */
final case class HashiCorpSecret(path: String, name: String,
    vault: String = "HASHICORP") extends Secret {
  require(vault.matches("^[A-Z_][A-Z0-9_]*$"),
    s"vault name must be uppercase letters, digits and underscores, " +
      s"not starting with a digit: '$vault'")

  private def envOrFail(suffix: String): String = {
    val v = s"TDS_${vault}_$suffix"
    SecretEnv.get(v).getOrElse(
      throw new NoSuchElementException(s"Environment variable $v not found."))
  }

  override def secretValue: String = {
    val url = envOrFail("URL")
    val token = envOrFail("TOKEN")
    val namespace = SecretEnv.get(s"TDS_${vault}_NAMESPACE")
    try {
      val builder = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"${url.stripSuffix("/")}/v1/secret/data/$path"))
        .header("X-Vault-Token", token)
        .GET()
      namespace.foreach(ns => builder.header("X-Vault-Namespace", ns))
      val resp = java.net.http.HttpClient.newHttpClient().send(
        builder.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200, s"vault answered ${resp.statusCode()}")
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(resp.body()).path("data").path("data").path(name)
      require(!node.isMissingNode, s"no field '$name' at secret path '$path'")
      node.asText()
    } catch {
      case e: Exception => throw new IllegalStateException(
        "Error while retrieving secret from Hashicorp Vault. Please verify " +
          "the secret path and name, as well as the environment variables " +
          "for the URL and the token (and the namespace if using one).", e)
    }
  }
  override def toString: String = s"HashiCorpSecret($path, $name, $vault)"
}

/** User/password pair for SQL sources and destinations. */
final case class UserPasswordCredentials(user: Secret, password: Secret) {
  /** JDBC connection properties with both secrets resolved NOW — feed to
    * [[JdbcSource]]/[[JdbcSink]] `properties`. */
  def jdbcProperties: Map[String, String] =
    Map("user" -> user.secretValue, "password" -> password.secretValue)
  override def toString: String = s"UserPasswordCredentials($user, $password)"
}

object UserPasswordCredentials {
  def apply(user: String, password: String): UserPasswordCredentials =
    UserPasswordCredentials(Secret(user), Secret(password))
}

/** AWS access-key pair for `s3a://` locations. */
final case class S3AccessKeyCredentials(awsAccessKeyId: Secret,
    awsSecretAccessKey: Secret) {
  /** Hadoop S3A configuration with the secrets resolved NOW — set on
    * `spark.sparkContext.hadoopConfiguration` (or per-bucket keys) before
    * reading an `s3a://` URI. */
  def hadoopOptions: Map[String, String] = Map(
    "fs.s3a.access.key" -> awsAccessKeyId.secretValue,
    "fs.s3a.secret.key" -> awsSecretAccessKey.secretValue)
  override def toString: String =
    s"S3AccessKeyCredentials($awsAccessKeyId, $awsSecretAccessKey)"
}

object S3AccessKeyCredentials {
  def apply(id: String, key: String): S3AccessKeyCredentials =
    S3AccessKeyCredentials(Secret(id), Secret(key))
}

/** Azure storage-account name + key for `abfss://` locations. */
final case class AzureAccountKeyCredentials(accountName: Secret,
    accountKey: Secret) {
  def hadoopOptions: Map[String, String] = {
    val acct = accountName.secretValue
    Map(s"fs.azure.account.key.$acct.dfs.core.windows.net" ->
      accountKey.secretValue)
  }
  override def toString: String =
    s"AzureAccountKeyCredentials($accountName, $accountKey)"
}

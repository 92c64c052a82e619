package graft.sources

/** The testable half of the reference's secrets machinery (reference
  * src/mongo_secrets.cpp:1, test/sql/secrets/secrets_basic.test:1,
  * secrets_validation.test:1): option-schema validation, MongoDB
  * connection-string assembly, and the REDACTION CONTRACT — secret
  * values (`password`, `tlscafile`) must never surface in attach
  * errors, logs, `EXPLAIN` output, or table properties. A wire adapter
  * behind the [[DocstoreClient]] seam calls [[validate]] from `ping()`
  * (ATTACH-time failure) and may only ever print [[describe]] /
  * [[redactedConnectionString]], never the raw option map or
  * [[connectionString]].
  */
object DocstoreSecrets {

  /** Parameter names the mongo secret type accepts, including the
    * reference's aliases (`username` → user, `dbname` → database). */
  val KnownParams: Set[String] = Set(
    "host", "port", "user", "username", "password", "database", "dbname",
    "authsource", "srv", "tls", "ssl", "tlscafile",
    "tlsallowinvalidcertificates")

  /** Values that must be redacted anywhere options are printed
    * (reference `redact_keys = {"password"}` plus the CA-file path,
    * which can itself be sensitive infrastructure detail). */
  val RedactKeys: Set[String] = Set("password", "tlscafile")

  private def norm(options: Map[String, String]): Map[String, String] =
    options.map { case (k, v) => k.toLowerCase -> v }

  private def truthy(v: String): Boolean =
    Seq("true", "1", "yes").contains(v.toLowerCase)

  /** Eager validation — reference secrets_validation.test behavior:
    * unknown parameter names are rejected (with the reference's message
    * shape), `port` must be numeric, and empty values are fine. Error
    * messages never embed a secret VALUE, only parameter names. */
  def validate(options: Map[String, String]): Unit = {
    val m = norm(options)
    m.keys.find(!KnownParams.contains(_)).foreach { k =>
      throw new IllegalArgumentException(
        s"Unknown parameter '$k' for secret type 'mongo'")
    }
    m.get("port").foreach { p =>
      if (!p.forall(_.isDigit) || p.isEmpty)
        throw new IllegalArgumentException(
          s"Invalid port for secret type 'mongo': expected an integer")
    }
  }

  /** `BuildMongoConnectionString` parity (reference
    * src/mongo_secrets.cpp:30): userinfo percent-encoded with the
    * unreserved alphabet, SRV drops the port and adds
    * `retryWrites=true&w=majority`, `tls` wins over `ssl`, and an
    * `attachPath` contributes extra query parameters (either the query
    * string of a full mongodb:// URI or space-separated key=value
    * pairs). CONTAINS THE RAW PASSWORD — never log or display; that is
    * what [[redactedConnectionString]] is for. */
  def connectionString(options: Map[String, String],
      attachPath: String = ""): String = {
    val m = norm(options)
    def get(k: String, alias: String = null, dflt: String = ""): String =
      m.get(k).orElse(Option(alias).flatMap(m.get)).getOrElse(dflt)
    val host = get("host", dflt = "localhost")
    val port = get("port", dflt = "27017")
    val user = get("user", "username")
    val password = get("password")
    val database = get("database", "dbname")
    val useSrv = truthy(get("srv", dflt = "false"))
    val sb = new StringBuilder(if (useSrv) "mongodb+srv://" else "mongodb://")
    if (user.nonEmpty || password.nonEmpty) {
      sb ++= percentEncodeUserInfo(user)
      if (password.nonEmpty) sb ++= ":" + percentEncodeUserInfo(password)
      sb ++= "@"
    }
    sb ++= (if (useSrv) host else s"$host:$port")
    if (database.nonEmpty) sb ++= "/" + database
    val params = scala.collection.mutable.ArrayBuffer.empty[String]
    val auth = get("authsource")
    if (auth.nonEmpty) params += s"authSource=$auth"
    if (useSrv) { params += "retryWrites=true"; params += "w=majority" }
    val tls = get("tls")
    if (tls.nonEmpty) { if (truthy(tls)) params += "tls=true" }
    else if (truthy(get("ssl"))) params += "tls=true"
    val ca = get("tlscafile")
    if (ca.nonEmpty) params += s"tlsCAFile=$ca"
    if (truthy(get("tlsallowinvalidcertificates")))
      params += "tlsAllowInvalidCertificates=true"
    if (attachPath.nonEmpty) {
      if (attachPath.startsWith("mongodb://") ||
          attachPath.startsWith("mongodb+srv://")) {
        val q = attachPath.indexOf('?')
        if (q >= 0 && q < attachPath.length - 1)
          params ++= attachPath.substring(q + 1).split("&").filter(_.nonEmpty)
      } else {
        attachPath.split(" ").foreach { pair =>
          val pos = pair.indexOf('=')
          if (pos > 0)
            params += pair.substring(0, pos).trim.toLowerCase + "=" +
              pair.substring(pos + 1).trim
        }
      }
    }
    // deliberate divergence from the reference builder, which emits
    // "host:port?opts": the MongoDB URI spec requires a '/' between the
    // host list and any options, and conformant drivers (mongoc,
    // pymongo) reject the slashless form
    if (params.nonEmpty) {
      if (database.isEmpty) sb ++= "/"
      sb ++= "?" + params.mkString("&")
    }
    sb.result()
  }

  /** RFC 3986 userinfo percent-encoding, unreserved alphabet only —
    * byte-for-byte the reference's `PercentEncodeUserInfo`. */
  def percentEncodeUserInfo(s: String): String = {
    val out = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = b.toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) out += c
      else out ++= f"%%${b & 0xff}%02X"
    }
    out.result()
  }

  /** Option map with secret values replaced — the only form that may be
    * logged or attached to table properties. */
  def redacted(options: Map[String, String]): Map[String, String] =
    options.map { case (k, v) =>
      k -> (if (RedactKeys.contains(k.toLowerCase)) "redacted" else v) }

  /** `secret_string` analog (reference secrets_validation.test asserts
    * `password=redacted` appears): deterministic key order, secrets
    * redacted. */
  def describe(options: Map[String, String]): String =
    redacted(norm(options)).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(";")

  /** Display form of the connection string: assembled with secret
    * values already redacted — including secret-named query parameters
    * smuggled in through `attachPath` — so no secret bytes ever enter
    * it. */
  def redactedConnectionString(options: Map[String, String],
      attachPath: String = ""): String = {
    val secretParam = "(?i)(password|secret|token|tlscafile)=[^&]*".r
    val cleanPath = secretParam.replaceAllIn(attachPath, m =>
      m.group(1) + "=redacted")
    connectionString(redacted(norm(options)), cleanPath)
  }
}

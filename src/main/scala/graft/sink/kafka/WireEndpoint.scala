package graft.sink.kafka

import graft.source.postgres.PgTls

/** Bootstrap-string form of the wire producer's endpoint, TLS included, so
  * the TLS decision flows through every existing string plumbing point (the
  * `GRAFT_KAFKA_BOOTSTRAP` env, the frames sink's `bootstrap` option, the
  * producer pool key) without threading new parameters through DSv2:
  *
  *   - `wire://host:port` — plaintext (unchanged).
  *   - `wire+tls://host:port?ca=<path>[&verify=full|ca|require]` — TLS
  *     from byte 0 (the Kafka protocol has no in-band upgrade; this is
  *     `security.protocol=SSL`). `verify` defaults to `full`:
  *       full    → verify-full (chain against `ca` + RFC 6125 hostname)
  *       ca      → verify-ca   (chain against `ca`, no hostname check)
  *       require → encrypt-only, peer NOT authenticated (libpq
  *                 sslmode=require semantics — see PgTls's loud caveat)
  *     `ca` is required for full/ca, ignored for require.
  *
  * Validation (mode spelling, readable CA file) happens in
  * [[PgTls.SslConfig]]'s constructor — a bad TLS bootstrap fails at parse
  * time, before any socket opens, never downgrading to plaintext.
  * Reference contract: the producer's TLS connect / verify-full accept /
  * reject-on-bad-cert tests, src/sink/kafka/producer_test.zig:70-282.
  */
object WireEndpoint {

  final case class Ep(host: String, port: Int,
      tls: Option[PgTls.SslConfig]) {
    /** Pool-key form: producers with different TLS identities must never
      * share a pooled connection. */
    def poolKey: (String, Int, String) = (host, port,
      tls.map(t => t.mode + "@" + t.rootCertPath.getOrElse(""))
        .getOrElse("plaintext"))
  }

  def accepts(bootstrap: String): Boolean =
    bootstrap != null &&
      (bootstrap.startsWith("wire://") || bootstrap.startsWith("wire+tls://"))

  def parse(bootstrap: String): Ep = {
    require(accepts(bootstrap), s"not a wire bootstrap: '$bootstrap'")
    val tlsScheme = bootstrap.startsWith("wire+tls://")
    val rest =
      bootstrap.stripPrefix(if (tlsScheme) "wire+tls://" else "wire://")
    val (hp, query) = rest.indexOf('?') match {
      case -1 => (rest, "")
      case i => (rest.substring(0, i), rest.substring(i + 1))
    }
    val ci = hp.lastIndexOf(':')
    require(ci > 0, s"wire bootstrap needs host:port, got '$bootstrap'")
    val tls = if (!tlsScheme) None else {
      val params = query.split('&').iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"malformed wire+tls param '$kv' (expected k=v)")
        (kv.substring(0, i), kv.substring(i + 1))
      }.toMap
      val unknown = params.keySet -- Set("ca", "verify")
      require(unknown.isEmpty,
        s"unknown wire+tls params ${unknown.mkString(", ")} (ca, verify)")
      val mode = params.getOrElse("verify", "full") match {
        case "full" => "verify-full"
        case "ca" => "verify-ca"
        case "require" => "require"
        case other => throw new IllegalArgumentException(
          s"unknown verify '$other' (allowed: full, ca, require)")
      }
      // ca values arrive percent-encoded (secureWireBootstrap encodes so
      // a path containing '&' survives the query split) — decode here
      Some(PgTls.SslConfig(mode,
        params.get("ca").map(java.net.URLDecoder.decode(_, "UTF-8"))))
    }
    Ep(hp.substring(0, ci), hp.substring(ci + 1).toInt, tls)
  }
}

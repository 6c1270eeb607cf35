package graft

import graft.source.postgres.{PgServerHarness, PgSession, SocketCopyBothChannel}

/** Test-scope singleton around [[PgServerHarness]]: one real PostgreSQL
  * instance per test JVM, shared by every live test; `available` is false
  * (→ tests `assume`-skip) where no postgres binaries exist. */
object LivePostgres {

  val SuperUser: String = PgServerHarness.DefaultSuperUser
  val ScramUser = "scram_user"
  val ScramPassword = "tiger+sesame"

  private lazy val harness: Option[PgServerHarness] =
    PgServerHarness.start(SuperUser, Some((ScramUser, ScramPassword)),
      tls = true)

  lazy val available: Boolean = harness.isDefined

  def port: Int = harness.get.port

  def endpoint(user: String, password: Option[String]): SocketCopyBothChannel.Endpoint =
    harness.get.endpoint(user, password)

  /** The server's self-signed certificate — the sslrootcert for
    * verify-ca/verify-full clients (None when TLS didn't come up). */
  def serverCert: Option[java.nio.file.Path] = harness.flatMap(_.serverCert)

  /** A fresh superuser session over our own wire stack (trust auth). */
  def session(): PgSession = harness.get.session()
}

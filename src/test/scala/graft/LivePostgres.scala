package graft

import graft.source.postgres.{PgSession, SocketCopyBothChannel}
import java.nio.file.{Files, Path, Paths}
import scala.sys.process._

/** Boots a REAL PostgreSQL server (`wal_level=logical`) for the live wire
  * tests — the integration tier the reference keeps in
  * `src/source/postgres/integration_test.zig` and `src/e2e/`. Everything
  * wire-level in this repo is first proven against [[FakeWalsender]] (an
  * independently written server side); this harness points the SAME client
  * stack at a genuine walsender, where CopyBoth timing, exported-snapshot
  * visibility, SCRAM server signatures, and catalog semantics are the real
  * thing rather than our reading of the spec.
  *
  * Environment contract: skips (tests `assume`) when no `initdb` is found.
  * When the JVM runs as root (this container), postgres refuses to start, so
  * commands are run through `su <postgres|nobody>`; otherwise they run
  * directly as the current user. The instance lives under a fresh tmp dir on
  * a free localhost port and is torn down by a JVM shutdown hook.
  */
object LivePostgres {

  val Host = "127.0.0.1"
  val SuperUser = "graft"
  val ScramUser = "scram_user"
  val ScramPassword = "tiger+sesame"

  private def findBinDir: Option[String] = {
    val candidates =
      Seq("15", "16", "17", "14").map(v => s"/usr/lib/postgresql/$v/bin") ++
        Seq("/usr/local/pgsql/bin", "/usr/local/bin", "/usr/bin")
    candidates.find(d => Files.isExecutable(Paths.get(d, "initdb")) &&
      Files.isExecutable(Paths.get(d, "pg_ctl")))
  }

  /** Non-root identity to run the server under when the JVM is root. */
  private def serverUser: Option[String] =
    if (System.getProperty("user.name") != "root") None
    else Seq("postgres", "nobody").find(u => Seq("id", "-u", u).! == 0)

  private def sh(cmd: String): Int = serverUser match {
    case Some(u) => Seq("su", u, "-s", "/bin/bash", "-c", s"cd /tmp && $cmd").!
    case None => Seq("/bin/bash", "-c", cmd).!
  }

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  @volatile private var bootedPort: Int = -1
  @volatile private var dataDir: Path = _
  @volatile private var binDir: String = _

  /** Boot once per JVM; false (→ assume-skip) if no binaries or boot fails. */
  lazy val available: Boolean =
    try findBinDir.exists { bin => binDir = bin; boot() }
    catch { case e: Throwable =>
      System.err.println(s"[livepg] boot failed, skipping live tests: $e")
      false
    }

  def port: Int = bootedPort

  def endpoint(user: String, password: Option[String]): SocketCopyBothChannel.Endpoint =
    SocketCopyBothChannel.Endpoint(Host, port, user, "postgres", password)

  /** A fresh superuser session over our own wire stack (trust auth). */
  def session(): PgSession = PgSession.connect(endpoint(SuperUser, None))

  private def boot(): Boolean = {
    val base = Files.createTempDirectory("graft-livepg-")
    dataDir = base.resolve("data")
    val sock = base.resolve("sock")
    Files.createDirectories(sock)
    bootedPort = freePort()
    // the server user must own the tree (we may be root)
    serverUser.foreach(u => Seq("chown", "-R", u, base.toString).!)
    if (sh(s"$binDir/initdb -D $dataDir -A trust -U $SuperUser " +
        s"> $base/initdb.log 2>&1") != 0) {
      System.err.println(s"[livepg] initdb failed, see $base/initdb.log")
      return false
    }
    // hba: SCRAM for the scram user (exercises the real SASL exchange
    // incl. server signature), trust for everything else local
    Files.writeString(dataDir.resolve("pg_hba.conf"),
      s"""host all $ScramUser $Host/32 scram-sha-256
         |host all all $Host/32 trust
         |local all all trust
         |""".stripMargin)
    serverUser.foreach(u =>
      Seq("chown", u, dataDir.resolve("pg_hba.conf").toString).!)
    val opts = Seq(
      s"-p $bootedPort",
      s"-c listen_addresses=$Host",
      "-c wal_level=logical",
      "-c max_wal_senders=8",
      "-c max_replication_slots=8",
      s"-c unix_socket_directories=$sock",
      // answer standby feedback promptly; keep the instance quiet
      "-c log_min_messages=warning").mkString(" ")
    if (sh(s"$binDir/pg_ctl -D $dataDir -o '$opts' -l $base/server.log " +
        "-w -t 30 start") != 0) {
      System.err.println(s"[livepg] pg_ctl start failed, see $base/server.log")
      return false
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      sh(s"$binDir/pg_ctl -D $dataDir -m immediate stop > /dev/null 2>&1")
      ()
    }))
    // wait until OUR stack can connect (server may still be in recovery)
    var s: PgSession = null
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (s == null && System.nanoTime() < deadline) {
      try s = session()
      catch { case _: Throwable => Thread.sleep(250) }
    }
    if (s == null) { System.err.println("[livepg] server never became ready")
      return false }
    try s.simpleQuery(
      s"CREATE ROLE $ScramUser LOGIN REPLICATION PASSWORD '$ScramPassword'")
    finally s.close()
    true
  }
}

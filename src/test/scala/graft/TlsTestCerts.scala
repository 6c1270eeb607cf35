package graft

import java.nio.file.{Files, Path}
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** Self-signed server credentials for TLS tests, generated offline with the
  * JDK's own `keytool` (no fixture files checked in, no third-party crypto
  * libs). Each call makes a FRESH keypair, so two servers never share a
  * root — exactly what the reject-on-unknown-CA case needs.
  */
object TlsTestCerts {

  final case class ServerCreds(context: SSLContext, certPath: Path)

  /** Generate a keypair whose certificate carries `san` (e.g.
    * `dns:localhost,ip:127.0.0.1`), build a server-side SSLContext from it,
    * and export the certificate (DER) for a client's sslrootcert. */
  def makeServer(san: String = "dns:localhost,ip:127.0.0.1"): ServerCreds = {
    val dir = Files.createTempDirectory("graft-tls")
    val ksPath = dir.resolve("server.p12")
    val storePass = "changeit"
    val keytool = java.nio.file.Paths.get(sys.props("java.home"), "bin", "keytool")
    val cmd = Seq(keytool.toString, "-genkeypair", "-alias", "server",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "30",
      "-storetype", "PKCS12", "-keystore", ksPath.toString,
      "-storepass", storePass, "-dname", "CN=localhost",
      "-ext", s"san=$san")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"keytool failed: $log")

    val ks = KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(ksPath)
    try ks.load(in, storePass.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, storePass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)

    val certPath = dir.resolve("server.der")
    Files.write(certPath, ks.getCertificate("server").getEncoded)
    ServerCreds(ctx, certPath)
  }
}

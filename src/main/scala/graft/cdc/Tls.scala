package graft.cdc

import java.net.Socket
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLSocket, TrustManagerFactory}

/** TLS material for the loopback wire path (SURVEY A1; reference:
  * `logical-replication-service.ts:75-78` passes the ClientConfig
  * `ssl` option through to pg.Client, which performs the libpq
  * SSLRequest dance before startup). A self-signed RSA keypair is
  * generated once per JVM with the JDK's own keytool into a temp
  * PKCS12 store; the server context keys with it and the client
  * context TRUSTS exactly that store — real certificate validation
  * on the handshake (not a trust-all manager), scoped to this
  * loopback pair. */
object Tls {
  private val Pass = "graft-wal-loopback".toCharArray

  private lazy val keystore: java.io.File = {
    val f = java.io.File.createTempFile("graft-wal-tls", ".p12")
    f.delete() // keytool refuses an existing empty file
    val keytool =
      new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "keytool").getPath
    val p = new ProcessBuilder(
      keytool, "-genkeypair", "-alias", "wal", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "7", "-storepass",
      new String(Pass), "-keystore", f.getPath, "-storetype", "PKCS12",
      "-dname", "CN=localhost").redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    require(p.waitFor() == 0, s"keytool self-signed keypair failed: $log")
    f.deleteOnExit()
    f
  }

  private def loadStore(): java.security.KeyStore = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(keystore)
    try ks.load(in, Pass) finally in.close()
    ks
  }

  lazy val serverContext: SSLContext = {
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadStore(), Pass)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  lazy val clientContext: SSLContext = {
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(loadStore())
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Upgrade an accepted socket to server-mode TLS. The plain-text
    * SSLRequest bytes were fully consumed before this, so the TLS
    * record stream starts clean — the same layering PG uses ('S'
    * answer, then handshake). */
  def wrapServer(sock: Socket): SSLSocket = {
    val s = serverContext.getSocketFactory
      .createSocket(sock, null, sock.getPort, true)
      .asInstanceOf[SSLSocket]
    s.setUseClientMode(false)
    s
  }

  /** Upgrade a connected socket to client-mode TLS and complete the
    * handshake (certificate validated against the loopback store). */
  def wrapClient(sock: Socket, host: String): SSLSocket = {
    val s = clientContext.getSocketFactory
      .createSocket(sock, host, sock.getPort, true)
      .asInstanceOf[SSLSocket]
    s.setUseClientMode(true)
    s.startHandshake()
    s
  }
}

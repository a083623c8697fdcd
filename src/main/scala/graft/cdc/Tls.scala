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
      "-dname", "CN=localhost",
      // SAN so sslmode=verify-full's endpoint identification accepts
      // both the name and the loopback address
      "-ext", "SAN=dns:localhost,ip:127.0.0.1")
      .redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    require(p.waitFor() == 0, s"keytool self-signed keypair failed: $log")
    f.deleteOnExit()
    f
  }

  /** Path + password of the per-JVM loopback store — the default CA
    * material for `sslmode=verify-full` when the caller supplies no
    * truststore (and the WRONG store for a negative test: any other
    * self-signed keypair fails validation against it). */
  def defaultStorePath: String = keystore.getPath
  def defaultStorePass: Array[Char] = Pass.clone()

  /** A separate self-signed keypair in a fresh PKCS12 store — an
    * UNRELATED CA. Trusting it while the server keys with the
    * loopback store must fail the verify-full handshake (the
    * wrong-CA rejection path a production rollout tests first). */
  def freshUnrelatedStore(): java.io.File = {
    val f = java.io.File.createTempFile("graft-wal-tls-other", ".p12")
    f.delete()
    val keytool =
      new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "keytool").getPath
    val p = new ProcessBuilder(
      keytool, "-genkeypair", "-alias", "other", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "7", "-storepass",
      new String(Pass), "-keystore", f.getPath, "-storetype", "PKCS12",
      "-dname", "CN=localhost",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1")
      .redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    require(p.waitFor() == 0, s"keytool unrelated keypair failed: $log")
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

  /** Client context trusting a caller-supplied PKCS12 CA store —
    * `sslmode=verify-full` with user material (libpq's sslrootcert). */
  def clientContextFor(storePath: String,
      storePass: Array[Char]): SSLContext = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(storePath)
    try ks.load(in, storePass) finally in.close()
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Encrypt-only context for `sslmode=require` — libpq parity:
    * require encrypts the channel but does NOT validate the peer
    * certificate (that is exactly what distinguishes it from
    * verify-ca/verify-full; postgresql.org/docs/current/libpq-ssl
    * .html's protection table). Scoped to that one mode; every
    * validating path uses a real trust store. */
  private def trustAllManagers: Array[javax.net.ssl.TrustManager] =
    Array[javax.net.ssl.TrustManager](
      new javax.net.ssl.X509TrustManager {
        override def checkClientTrusted(
            chain: Array[java.security.cert.X509Certificate],
            authType: String): Unit = ()
        override def checkServerTrusted(
            chain: Array[java.security.cert.X509Certificate],
            authType: String): Unit = ()
        override def getAcceptedIssuers
            : Array[java.security.cert.X509Certificate] = Array.empty
      })

  private lazy val trustAllContext: SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, trustAllManagers, null)
    ctx
  }

  /** Upgrade a connected socket per the libpq sslmode contract:
    *  - "require": encrypt, no certificate validation
    *  - "verify-ca": validate the chain against `truststore` (the
    *    per-JVM loopback store when None), hostname NOT checked
    *  - "verify-full": verify-ca PLUS the hostname (JDK endpoint
    *    identification — SAN dns/ip match)
    * `clientKeystore` adds CLIENT-certificate material (libpq's
    * sslcert/sslkey — mutual TLS): the socket offers that keypair
    * when the server requests client auth.
    * Completes the handshake before returning, so a rejected
    * certificate fails HERE, before any startup byte leaves. */
  def wrapClientMode(sock: Socket, host: String, sslmode: String,
      truststore: Option[String],
      storePass: Option[Array[Char]],
      clientKeystore: Option[String] = None,
      clientKeystorePass: Option[Array[Char]] = None): SSLSocket = {
    def kms: Array[javax.net.ssl.KeyManager] =
      clientKeystore.map { p =>
        val ks = java.security.KeyStore.getInstance("PKCS12")
        val in = new java.io.FileInputStream(p)
        val pw = clientKeystorePass.getOrElse(Pass)
        try ks.load(in, pw) finally in.close()
        val kmf = KeyManagerFactory.getInstance(
          KeyManagerFactory.getDefaultAlgorithm)
        kmf.init(ks, pw)
        kmf.getKeyManagers
      }.orNull
    val ctx = sslmode match {
      case "require" =>
        if (clientKeystore.isEmpty) trustAllContext
        else {
          val c = SSLContext.getInstance("TLS")
          c.init(kms, trustAllManagers, null)
          c
        }
      case "verify-ca" | "verify-full" =>
        val ks = java.security.KeyStore.getInstance("PKCS12")
        val (path, pw) = (truststore.getOrElse(defaultStorePath),
          storePass.getOrElse(Pass))
        val in = new java.io.FileInputStream(path)
        try ks.load(in, pw) finally in.close()
        val tmf = TrustManagerFactory.getInstance(
          TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        val c = SSLContext.getInstance("TLS")
        c.init(kms, tmf.getTrustManagers, null)
        c
      case m => throw new IllegalArgumentException(
        s"sslmode '$m' cannot upgrade a socket (disable never gets here)")
    }
    val s = ctx.getSocketFactory
      .createSocket(sock, host, sock.getPort, true)
      .asInstanceOf[SSLSocket]
    s.setUseClientMode(true)
    if (sslmode == "verify-full") {
      val params = s.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(params)
    }
    s.startHandshake()
    s
  }

  /** Server-mode upgrade REQUIRING a client certificate (mutual TLS):
    * keys with the loopback store and trusts it for the client's
    * chain — a client without a cert from that store fails the
    * session. */
  def wrapServerMutual(sock: Socket): SSLSocket = {
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadStore(), Pass)
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(loadStore())
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    val s = ctx.getSocketFactory
      .createSocket(sock, null, sock.getPort, true)
      .asInstanceOf[SSLSocket]
    s.setUseClientMode(false)
    s.setNeedClientAuth(true)
    s
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

package graft.cdc

import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 and SCRAM-SHA-256-PLUS (RFC 5802/7677) —
  * PostgreSQL's default password auth since v10, so it's the FIRST
  * exchange a real replication client survives before
  * `START_REPLICATION` can run; the reference inherits it from
  * `pg.Client`'s SASL support (`logical-replication-service.ts:72-87`
  * just passes the password through; pg >= 8.11,
  * `/root/reference/package.json:93` peer dep, negotiates `-PLUS`
  * with tls-server-end-point binding when the server offers it, as
  * libpq does). Pure JDK crypto (PBKDF2/HMAC/SHA-256).
  *
  * Channel binding (RFC 5802 §6 + RFC 5929 §4): on TLS the client
  * binds the SASL exchange to the server's certificate — the GS2
  * header becomes `p=tls-server-end-point,,` and the client-final
  * `c=` carries base64(gs2-header ++ cert-hash). A MITM holding a
  * DIFFERENT valid certificate sees the binding mismatch server-side
  * and the exchange dies — the one attack plain SCRAM-over-TLS
  * doesn't stop. The `y,,` header ("I support binding but you didn't
  * offer -PLUS") must be REJECTED by a server that did offer it:
  * that's the downgrade-detection half of the protocol.
  *
  * Wire shape inside the startup phase ([[PgStartup]]):
  * AuthenticationSASL (R/10, mechanism list) → SASLInitialResponse
  * ('p', mechanism + client-first) → AuthenticationSASLContinue
  * (R/11, server-first) → SASLResponse ('p', client-final) →
  * AuthenticationSASLFinal (R/12, `v=` server signature) →
  * AuthenticationOk (R/0).
  *
  * RFC 7677 §3's published example (user/pencil) pins the whole
  * derivation in ScramSpec.
  */
object Scram {
  val Mechanism = "SCRAM-SHA-256"
  val MechanismPlus = "SCRAM-SHA-256-PLUS"

  /** The client's channel-binding stance, encoded in the GS2 header
    * (RFC 5802 §7 `gs2-cbind-flag`). */
  sealed trait Binding { def gs2: String; def cbindData: Array[Byte] }
  /** Cleartext connection — binding not applicable (`n`). */
  case object NoTls extends Binding {
    val gs2 = "n,,"; val cbindData = Array.emptyByteArray
  }
  /** TLS, client supports binding, but the server did not advertise
    * `-PLUS` (`y`). A binding-capable server MUST reject this — it
    * means a MITM stripped the `-PLUS` offer. */
  case object TlsServerNoPlus extends Binding {
    val gs2 = "y,,"; val cbindData = Array.emptyByteArray
  }
  /** `-PLUS` negotiated: bind to the server certificate's
    * tls-server-end-point hash (`p=`). */
  final case class EndPoint(data: Array[Byte]) extends Binding {
    val gs2 = "p=tls-server-end-point,,"; def cbindData = data
  }

  /** RFC 5929 §4.1 tls-server-end-point data: hash of the DER cert
    * with the certificate signature's hash algorithm, MD5 and SHA-1
    * upgraded to SHA-256 (PG does the same — `be-secure-openssl.c`'s
    * `be_tls_get_certificate_hash` in the public sources). */
  def tlsServerEndPoint(
      cert: java.security.cert.X509Certificate): Array[Byte] = {
    val alg = cert.getSigAlgName.toUpperCase(java.util.Locale.ROOT)
    val h =
      if (alg.contains("SHA224")) "SHA-224"
      else if (alg.contains("SHA384")) "SHA-384"
      else if (alg.contains("SHA512")) "SHA-512"
      else if (alg.contains("SHA256") ||
        alg.contains("MD5") || alg.contains("SHA1")) "SHA-256"
      else
        // e.g. RSASSA-PSS, where the digest hides in the parameters:
        // refusing beats guessing — a silent SHA-256 here would fail
        // the binding against a compliant peer with an unexplainable
        // auth error (PG refuses these certs for binding too)
        throw new IllegalArgumentException(
          s"cannot derive tls-server-end-point hash from signature " +
            s"algorithm '${cert.getSigAlgName}'")
    java.security.MessageDigest.getInstance(h).digest(cert.getEncoded)
  }

  /** `c=` attribute value: base64(gs2-header ++ cbind-data). */
  private def cbindB64(gs2: String, data: Array[Byte]): String =
    Base64.getEncoder.encodeToString(
      gs2.getBytes(StandardCharsets.UTF_8) ++ data)

  def h(data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(data)

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** Hi() = PBKDF2-HMAC-SHA256, RFC 5802 §2.2. */
  def saltedPassword(password: String, salt: Array[Byte],
      iterations: Int): Array[Byte] = {
    val f = javax.crypto.SecretKeyFactory
      .getInstance("PBKDF2WithHmacSHA256")
    f.generateSecret(new PBEKeySpec(
      password.toCharArray, salt, iterations, 256)).getEncoded
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  private def b64(b: Array[Byte]): String =
    Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  private def attrs(msg: String): Map[Char, String] =
    msg.split(",").filter(_.length >= 2).map(p => p(0) -> p.drop(2)).toMap

  /** Client half. PG ignores the SCRAM `n=` username (it keys the
    * role off the StartupMessage), so it is sent empty — the same
    * thing libpq does. `binding` defaults to the cleartext stance. */
  final class Client(password: String, val clientNonce: String,
      binding: Binding = NoTls) {
    private val clientFirstBare = s"n=,r=$clientNonce"
    private var authMessage: String = _
    private var salted: Array[Byte] = _

    def clientFirstMessage: String = binding.gs2 + clientFirstBare

    /** server-first → client-final (throws on a nonce that does not
      * extend ours — a MITM replaying someone else's exchange). */
    def handleServerFirst(serverFirst: String): String = {
      val a = attrs(serverFirst)
      val nonce = a('r')
      require(nonce.startsWith(clientNonce),
        "server nonce does not extend the client nonce")
      val salt = unb64(a('s'))
      val iters = a('i').toInt
      salted = saltedPassword(password, salt, iters)
      val clientKey = hmac(salted, "Client Key")
      val storedKey = h(clientKey)
      val withoutProof =
        s"c=${cbindB64(binding.gs2, binding.cbindData)},r=$nonce"
      authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
      val proof = xor(clientKey, hmac(storedKey, authMessage))
      s"$withoutProof,p=${b64(proof)}"
    }

    /** Mutual auth: the `v=` in AuthenticationSASLFinal proves the
      * server knew the password derivative too. */
    def verifyServerFinal(serverFinal: String): Boolean = {
      val v = attrs(serverFinal).getOrElse('v', "")
      java.security.MessageDigest.isEqual(unb64(v),
        hmac(hmac(salted, "Server Key"), authMessage))
    }
  }

  /** Server half (the walsender side of the loopback).
    *
    * @param offeredPlus    the server ADVERTISED `-PLUS` (TLS session
    *                       with a certificate) — makes a `y,,` client
    *                       a detected downgrade
    * @param plusNegotiated the client PICKED `-PLUS` — the `p=` gs2
    *                       header and cert-hash binding are mandatory
    * @param cbindData      this server's own tls-server-end-point
    *                       hash, checked against the client-final `c=` */
  final class Server(password: String, salt: Array[Byte],
      iterations: Int, serverNoncePart: String,
      offeredPlus: Boolean = false, plusNegotiated: Boolean = false,
      cbindData: Array[Byte] = Array.emptyByteArray) {
    private var clientFirstBare: String = _
    private var serverFirst: String = _
    private var fullNonce: String = _
    private var expectedC: String = _
    private val salted = saltedPassword(password, salt, iterations)

    def handleClientFirst(clientFirst: String): String = {
      val gs2 =
        if (clientFirst.startsWith("p=tls-server-end-point,,"))
          "p=tls-server-end-point,,"
        else if (clientFirst.startsWith("y,,")) "y,,"
        else if (clientFirst.startsWith("n,,")) "n,,"
        else throw new IllegalArgumentException(
          s"unsupported GS2 header in '$clientFirst'")
      // RFC 5802 §6 downgrade detection: 'y' claims the server never
      // offered binding — if we DID offer -PLUS, someone stripped it
      require(!(gs2 == "y,," && offeredPlus),
        "client claims no -PLUS was offered, but it was — " +
          "channel-binding downgrade detected")
      require(!plusNegotiated || gs2.startsWith("p="),
        "SCRAM-SHA-256-PLUS requires the p= gs2 header")
      require(plusNegotiated || !gs2.startsWith("p="),
        "channel binding requires the -PLUS mechanism")
      expectedC = cbindB64(gs2,
        if (gs2.startsWith("p=")) cbindData else Array.emptyByteArray)
      clientFirstBare = clientFirst.drop(gs2.length)
      fullNonce = attrs(clientFirstBare)('r') + serverNoncePart
      serverFirst = s"r=$fullNonce,s=${b64(salt)},i=$iterations"
      serverFirst
    }

    /** client-final → Right(server-final `v=`) or Left(error). */
    def handleClientFinal(clientFinal: String): Either[String, String] = {
      val a = attrs(clientFinal)
      if (!a.get('r').contains(fullNonce))
        return Left("nonce mismatch")
      if (!a.get('c').contains(expectedC))
        return Left("channel-binding mismatch")
      val withoutProof = clientFinal.take(clientFinal.lastIndexOf(",p="))
      val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
      val clientKey = hmac(salted, "Client Key")
      val storedKey = h(clientKey)
      val signature = hmac(storedKey, authMessage)
      val proof = unb64(a.getOrElse('p', ""))
      // recover ClientKey from the proof and check H(ClientKey):
      // the server never needs the cleartext ClientKey stored
      val ok = proof.length == signature.length &&
        java.security.MessageDigest.isEqual(h(xor(proof, signature)),
          storedKey)
      if (!ok) Left("password authentication failed")
      else Right(s"v=${b64(hmac(hmac(salted, "Server Key"), authMessage))}")
    }
  }
}

package graft.cdc

import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 (RFC 5802/7677) — PostgreSQL's default password
  * auth since v10, so it's the FIRST exchange a real replication
  * client survives before `START_REPLICATION` can run; the reference
  * inherits it from `pg.Client`'s SASL support
  * (`logical-replication-service.ts:72-87` just passes the password
  * through). Pure JDK crypto (PBKDF2/HMAC/SHA-256), no channel
  * binding (`n,,` / `c=biws` — PG's non-TLS loopback path).
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
  private val GS2Header = "n,," // no channel binding
  private val B64GS2 = Base64.getEncoder
    .encodeToString(GS2Header.getBytes(StandardCharsets.UTF_8)) // "biws"

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
    * thing libpq does. */
  final class Client(password: String, val clientNonce: String) {
    private val clientFirstBare = s"n=,r=$clientNonce"
    private var authMessage: String = _
    private var salted: Array[Byte] = _

    def clientFirstMessage: String = GS2Header + clientFirstBare

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
      val withoutProof = s"c=$B64GS2,r=$nonce"
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

  /** Server half (the walsender side of the loopback). */
  final class Server(password: String, salt: Array[Byte],
      iterations: Int, serverNoncePart: String) {
    private var clientFirstBare: String = _
    private var serverFirst: String = _
    private var fullNonce: String = _
    private val salted = saltedPassword(password, salt, iterations)

    def handleClientFirst(clientFirst: String): String = {
      require(clientFirst.startsWith(GS2Header),
        s"unsupported GS2 header in '$clientFirst'")
      clientFirstBare = clientFirst.drop(GS2Header.length)
      fullNonce = attrs(clientFirstBare)('r') + serverNoncePart
      serverFirst = s"r=$fullNonce,s=${b64(salt)},i=$iterations"
      serverFirst
    }

    /** client-final → Right(server-final `v=`) or Left(error). */
    def handleClientFinal(clientFinal: String): Either[String, String] = {
      val a = attrs(clientFinal)
      if (!a.get('r').contains(fullNonce))
        return Left("nonce mismatch")
      if (!a.get('c').contains(B64GS2))
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

package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** SCRAM-SHA-256 pinned to RFC 7677 §3's published example
  * (user/pencil) — every derived value in the exchange must
  * reproduce the RFC byte-for-byte — plus round-trip and tamper
  * cases for the client/server state machines. */
class ScramSpec extends AnyFunSuite {

  private val rfcSaltB64 = "W22ZaJ0SNY7soEsUEjb6gQ=="
  private val rfcSalt = java.util.Base64.getDecoder.decode(rfcSaltB64)
  private val rfcClientFirst = "n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
  private val rfcServerNoncePart = "%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
  private val rfcServerFirst =
    s"r=rOprNGfwEbeRWgbNEkqO$rfcServerNoncePart,s=$rfcSaltB64,i=4096"
  private val rfcClientFinal =
    s"c=biws,r=rOprNGfwEbeRWgbNEkqO$rfcServerNoncePart," +
      "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
  private val rfcServerFinal = "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="

  test("server half reproduces the RFC 7677 example exchange") {
    val s = new Scram.Server("pencil", rfcSalt, 4096, rfcServerNoncePart)
    assert(s.handleClientFirst(rfcClientFirst) == rfcServerFirst)
    assert(s.handleClientFinal(rfcClientFinal) == Right(rfcServerFinal))
  }

  test("server rejects a proof for the wrong password") {
    val s = new Scram.Server("not-pencil", rfcSalt, 4096,
      rfcServerNoncePart)
    s.handleClientFirst(rfcClientFirst)
    assert(s.handleClientFinal(rfcClientFinal) ==
      Left("password authentication failed"))
  }

  test("server rejects a replayed nonce and bad channel binding") {
    val s = new Scram.Server("pencil", rfcSalt, 4096, rfcServerNoncePart)
    s.handleClientFirst(rfcClientFirst)
    val otherNonce = rfcClientFinal.replace("rOprNGfwEbeRWgbNEkqO", "xxxx")
    assert(s.handleClientFinal(otherNonce) == Left("nonce mismatch"))
    val s2 = new Scram.Server("pencil", rfcSalt, 4096, rfcServerNoncePart)
    s2.handleClientFirst(rfcClientFirst)
    assert(s2.handleClientFinal(rfcClientFinal.replace("c=biws", "c=eSws"))
      == Left("channel-binding mismatch"))
  }

  test("client/server state machines complete a full mutual auth") {
    val client = new Scram.Client("hunter2", "deadbeefnonce")
    val server = new Scram.Server("hunter2",
      "0123456789abcdef".getBytes, 4096, "srvnonce")
    val sf = server.handleClientFirst(client.clientFirstMessage)
    val cf = client.handleServerFirst(sf)
    val Right(v) = server.handleClientFinal(cf)
    assert(client.verifyServerFinal(v), "mutual auth: v= must verify")
    assert(!client.verifyServerFinal("v=AAAA"), "forged v= must fail")
  }

  test("client rejects a server nonce that does not extend its own") {
    val client = new Scram.Client("pw", "mynonce")
    val ex = intercept[IllegalArgumentException] {
      client.handleServerFirst("r=stolen,s=" + rfcSaltB64 + ",i=4096")
    }
    assert(ex.getMessage.contains("does not extend"))
  }

  test("property: round trip succeeds iff passwords match") {
    val rnd = new scala.util.Random(42) // deterministic seed
    def tok(): String = rnd.alphanumeric.take(12 + rnd.nextInt(12)).mkString
    for (_ <- 1 to 25) {
      val pw = tok()
      val salt = Array.fill(16)(rnd.nextInt(256).toByte)
      val client = new Scram.Client(pw, tok())
      val server = new Scram.Server(pw, salt, 1024, tok())
      val cf = client.handleServerFirst(
        server.handleClientFirst(client.clientFirstMessage))
      val Right(v) = server.handleClientFinal(cf)
      assert(client.verifyServerFinal(v))

      val wrong = new Scram.Client(pw + "x", tok())
      val server2 = new Scram.Server(pw, salt, 1024, tok())
      val cf2 = wrong.handleServerFirst(
        server2.handleClientFirst(wrong.clientFirstMessage))
      assert(server2.handleClientFinal(cf2) ==
        Left("password authentication failed"))
    }
  }
}

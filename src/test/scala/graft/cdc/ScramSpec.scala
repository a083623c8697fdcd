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

  test("-PLUS: exchange binds to the certificate hash and completes " +
      "(tls-server-end-point)") {
    // r11 verdict ask 2: synthetic cert-hash bytes stand in for the
    // tls-server-end-point data — the binding algebra is the same
    val cb = (0 until 32).map(_.toByte).toArray
    val client = new Scram.Client("hunter2", "cbnonce", Scram.EndPoint(cb))
    assert(client.clientFirstMessage.startsWith("p=tls-server-end-point,,"))
    val server = new Scram.Server("hunter2", "0123456789abcdef".getBytes,
      4096, "srv", offeredPlus = true, plusNegotiated = true,
      cbindData = cb)
    val cf = client.handleServerFirst(
      server.handleClientFirst(client.clientFirstMessage))
    // the c= attribute now carries gs2 ++ cert-hash, not plain "biws"
    assert(!cf.startsWith("c=biws,"), s"binding missing from '$cf'")
    val Right(v) = server.handleClientFinal(cf)
    assert(client.verifyServerFinal(v), "-PLUS mutual auth must verify")
  }

  test("-PLUS: a MITM with a DIFFERENT certificate fails the binding") {
    val cbClient = (0 until 32).map(_.toByte).toArray
    val cbServer = (1 to 32).map(_.toByte).toArray // not the same cert
    val client = new Scram.Client("hunter2", "cbnonce",
      Scram.EndPoint(cbClient))
    val server = new Scram.Server("hunter2", "0123456789abcdef".getBytes,
      4096, "srv", offeredPlus = true, plusNegotiated = true,
      cbindData = cbServer)
    val cf = client.handleServerFirst(
      server.handleClientFirst(client.clientFirstMessage))
    assert(server.handleClientFinal(cf) ==
      Left("channel-binding mismatch"))
  }

  test("downgrade detection: gs2 'y' is rejected when -PLUS was " +
      "offered, accepted when it truly wasn't") {
    val client = new Scram.Client("pw", "ynonce", Scram.TlsServerNoPlus)
    assert(client.clientFirstMessage.startsWith("y,,"))
    // server DID offer -PLUS: 'y' means someone stripped the offer
    val strict = new Scram.Server("pw", "0123456789abcdef".getBytes,
      4096, "srv", offeredPlus = true)
    val ex = intercept[IllegalArgumentException] {
      strict.handleClientFirst(client.clientFirstMessage)
    }
    assert(ex.getMessage.contains("downgrade"))
    // server genuinely has no -PLUS (e.g. no TLS): 'y' is honest
    val plain = new Scram.Server("pw", "0123456789abcdef".getBytes,
      4096, "srv2")
    val client2 = new Scram.Client("pw", "ynonce2", Scram.TlsServerNoPlus)
    val cf = client2.handleServerFirst(
      plain.handleClientFirst(client2.clientFirstMessage))
    val Right(v) = plain.handleClientFinal(cf)
    assert(client2.verifyServerFinal(v))
  }

  test("gs2/mechanism coherence: p= without -PLUS (and -PLUS without " +
      "p=) are both rejected") {
    val s1 = new Scram.Server("pw", "0123456789abcdef".getBytes, 4096,
      "srv", offeredPlus = true, plusNegotiated = false)
    intercept[IllegalArgumentException] {
      s1.handleClientFirst("p=tls-server-end-point,,n=,r=x")
    }
    val s2 = new Scram.Server("pw", "0123456789abcdef".getBytes, 4096,
      "srv", offeredPlus = true, plusNegotiated = true,
      cbindData = Array[Byte](1, 2))
    intercept[IllegalArgumentException] {
      s2.handleClientFirst("n,,n=,r=x")
    }
  }

  test("tls-server-end-point picks the cert-signature hash " +
      "(SHA-1/MD5 upgraded to SHA-256) and digests the DER bytes") {
    // the loopback store's cert is SHA256-signed: binding data must
    // be the SHA-256 of the encoded cert, 32 bytes
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(Tls.defaultStorePath)
    try ks.load(in, Tls.defaultStorePass) finally in.close()
    import scala.jdk.CollectionConverters._
    val alias = ks.aliases().asScala.next()
    val cert = ks.getCertificate(alias)
      .asInstanceOf[java.security.cert.X509Certificate]
    val got = Scram.tlsServerEndPoint(cert)
    val want = java.security.MessageDigest.getInstance(
      if (cert.getSigAlgName.toUpperCase.contains("SHA384")) "SHA-384"
      else if (cert.getSigAlgName.toUpperCase.contains("SHA512")) "SHA-512"
      else "SHA-256").digest(cert.getEncoded)
    assert(got.toSeq == want.toSeq)
    assert(got.length == 32 || got.length == 48 || got.length == 64)
    // and two DIFFERENT certs never share binding data — the property
    // the MITM defence rests on
    val other = Tls.freshUnrelatedStore()
    val ks2 = java.security.KeyStore.getInstance("PKCS12")
    val in2 = new java.io.FileInputStream(other)
    try ks2.load(in2, Tls.defaultStorePass) finally in2.close()
    val alias2 = ks2.aliases().asScala.next()
    val cert2 = ks2.getCertificate(alias2)
      .asInstanceOf[java.security.cert.X509Certificate]
    assert(Scram.tlsServerEndPoint(cert2).toSeq != got.toSeq)
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

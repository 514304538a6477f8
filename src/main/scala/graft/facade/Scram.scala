package graft.facade

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM authentication (RFC 5802/7677), SHA-256 and SHA-512 — F9, the
  * reference's SASL SCRAM support (`nisshi-broker` sasl scram; credential
  * shape per the standard Kafka SCRAM credential store: salt, iteration
  * count, StoredKey, ServerKey — the server never holds the password;
  * persisted through `Storage::upsert_user_scram_credential`,
  * `nisshi-storage/src/lib.rs:1420-1432`).
  *
  * Pure JDK crypto (PBKDF2-HMAC-SHA-2 is RFC 5802's Hi(), HMAC from
  * javax.crypto) — no external dependency. Both halves of the exchange
  * are implemented: the broker-side [[ServerSession]] state machine and
  * the client-side proof computation (used by tests and any CLI client).
  */
object Scram {

  /** One SCRAM mechanism = a hash family: the SASL name plus the JDK
    * algorithm names RFC 5802's H/HMAC/Hi map onto.
    */
  final case class Mech(name: String, mdAlg: String, macAlg: String,
                        pbkdfAlg: String, keyBits: Int)
  val Sha256: Mech =
    Mech("SCRAM-SHA-256", "SHA-256", "HmacSHA256", "PBKDF2WithHmacSHA256", 256)
  val Sha512: Mech =
    Mech("SCRAM-SHA-512", "SHA-512", "HmacSHA512", "PBKDF2WithHmacSHA512", 512)
  val Mechanisms: Seq[Mech] = Seq(Sha256, Sha512)
  def mechanism(name: String): Option[Mech] = Mechanisms.find(_.name == name)

  val Mechanism = "SCRAM-SHA-256"
  val DefaultIterations = 4096

  def h(data: Array[Byte], mech: Mech = Sha256): Array[Byte] =
    MessageDigest.getInstance(mech.mdAlg).digest(data)

  def hmac(key: Array[Byte], data: Array[Byte],
           mech: Mech = Sha256): Array[Byte] = {
    val m = Mac.getInstance(mech.macAlg)
    m.init(new SecretKeySpec(key, mech.macAlg))
    m.doFinal(data)
  }

  /** RFC 5802 Hi(password, salt, i) = PBKDF2-HMAC-SHA-2. */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int,
                     mech: Mech = Sha256): Array[Byte] =
    javax.crypto.SecretKeyFactory.getInstance(mech.pbkdfAlg)
      .generateSecret(
        new PBEKeySpec(password.toCharArray, salt, iterations, mech.keyBits))
      .getEncoded

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  private val b64e = Base64.getEncoder
  private val b64d = Base64.getDecoder

  /** What the server stores per user — never the password itself. */
  final case class Credential(salt: Array[Byte], iterations: Int,
                              storedKey: Array[Byte], serverKey: Array[Byte])

  def credential(password: String, salt: Array[Byte],
                 iterations: Int = DefaultIterations,
                 mech: Mech = Sha256): Credential =
    credentialFromSaltedPassword(
      saltedPassword(password, salt, iterations, mech), salt, iterations, mech)

  /** KIP-554 upsert path (AlterUserScramCredentials): the admin client
    * sends Hi(password) — the server derives StoredKey/ServerKey from the
    * salted password and never sees the cleartext.
    */
  def credentialFromSaltedPassword(sp: Array[Byte], salt: Array[Byte],
                                   iterations: Int,
                                   mech: Mech = Sha256): Credential = {
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8), mech)
    Credential(salt, iterations, h(clientKey, mech),
      hmac(sp, "Server Key".getBytes(UTF_8), mech))
  }

  private def attrs(msg: String): Map[Char, String] =
    msg.split(",").filter(p => p.length >= 2 && p.charAt(1) == '=')
      .map(p => p.charAt(0) -> p.substring(2)).toMap

  /** Broker-side state machine: client-first → server-first,
    * client-final → server-final (or error). One instance per
    * connection; [[authenticatedUser]] flips on success.
    */
  final class ServerSession(lookup: String => Option[Credential],
                            serverNonce: () => String =
                              () => java.util.UUID.randomUUID().toString,
                            mech: Mech = Sha256) {
    private var user: String = _
    private var cred: Credential = _
    private var clientFirstBare: String = _
    private var serverFirst: String = _
    @volatile var authenticatedUser: Option[String] = None

    def handleClientFirst(msg: String): Either[String, String] = {
      // gs2-header "n,," (no channel binding) then n=<user>,r=<cnonce>
      if (!msg.startsWith("n,,")) return Left("channel binding not supported")
      clientFirstBare = msg.substring(3)
      val a = attrs(clientFirstBare)
      val u = a.getOrElse('n', return Left("missing user"))
      val cnonce = a.getOrElse('r', return Left("missing nonce"))
      lookup(u) match {
        case None => Left(s"unknown user")
        case Some(c) =>
          user = u; cred = c
          serverFirst = s"r=$cnonce${serverNonce()}," +
            s"s=${b64e.encodeToString(c.salt)},i=${c.iterations}"
          Right(serverFirst)
      }
    }

    def handleClientFinal(msg: String): Either[String, String] = try {
      if (serverFirst == null) return Left("out of order")
      val a = attrs(msg)
      val proof = b64d.decode(a.getOrElse('p', return Left("missing proof")))
      if (!attrs(serverFirst).get('r').contains(a.getOrElse('r', "")))
        return Left("nonce mismatch")
      val proofIdx = msg.lastIndexOf(",p=")
      if (proofIdx < 0) return Left("malformed client-final")
      val withoutProof = msg.substring(0, proofIdx)
      val authMessage =
        s"$clientFirstBare,$serverFirst,$withoutProof".getBytes(UTF_8)
      val clientSignature = hmac(cred.storedKey, authMessage, mech)
      val clientKey = xor(proof, clientSignature)
      if (!MessageDigest.isEqual(h(clientKey, mech), cred.storedKey))
        Left("authentication failed")
      else {
        authenticatedUser = Some(user)
        Right("v=" + b64e.encodeToString(hmac(cred.serverKey, authMessage, mech)))
      }
    } catch {
      // hostile client-final (bad base64, garbled attrs) is an AUTH
      // failure answered over the wire, never a dropped connection
      case scala.util.control.NonFatal(_) => Left("malformed client-final")
    }
  }

  // ---------------------------------------------------------- client side

  def clientFirst(user: String, cnonce: String): String = s"n,,n=$user,r=$cnonce"

  /** Compute client-final from the password and both first messages;
    * returns (client-final, expected server-final) so the caller can
    * verify the server too (mutual authentication).
    */
  def clientFinal(password: String, clientFirstMsg: String,
                  serverFirstMsg: String,
                  mech: Mech = Sha256): (String, String) = {
    val sf = attrs(serverFirstMsg)
    val salt = b64d.decode(sf('s'))
    val iterations = sf('i').toInt
    val combinedNonce = sf('r')
    val sp = saltedPassword(password, salt, iterations, mech)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8), mech)
    val withoutProof = s"c=${b64e.encodeToString("n,,".getBytes(UTF_8))},r=$combinedNonce"
    val authMessage = (clientFirstMsg.substring(3) + "," + serverFirstMsg +
      "," + withoutProof).getBytes(UTF_8)
    val proof = xor(clientKey, hmac(h(clientKey, mech), authMessage, mech))
    val serverSig = hmac(hmac(sp, "Server Key".getBytes(UTF_8), mech), authMessage, mech)
    (s"$withoutProof,p=${b64e.encodeToString(proof)}",
      "v=" + b64e.encodeToString(serverSig))
  }
}

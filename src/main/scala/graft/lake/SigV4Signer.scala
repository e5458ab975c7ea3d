package graft.lake

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing — the auth layer that
  * turns [[HttpConditionalPut]] into a REAL S3 commit adapter with
  * zero SDK bytes. The algorithm is fully public (AWS General
  * Reference, "Signature Version 4 signing process"): canonical
  * request → string-to-sign → HMAC-SHA256 key chain
  * (AWS4+secret → date → region → service → aws4_request) →
  * signature; all of it implementable on `java.security` /
  * `javax.crypto` alone. The spec pins this implementation against
  * AWS's own published documentation vector (AKIDEXAMPLE /
  * 20150830 / us-east-1 / iam / ListUsers — the worked example every
  * SDK validates against), and the HTTP race battery drives it over
  * real requests where the emulator re-derives the payload hash.
  *
  * Scope: header-based signing (`Authorization` header), unsigned
  * query strings pass through canonicalization; S3 additionally
  * requires the `x-amz-content-sha256` header, added when
  * `service == "s3"`. TEMPORARY credentials (STS / instance profile —
  * the norm in production) carry their `sessionToken`, signed as
  * `x-amz-security-token` exactly as the SDKs do. Caller headers
  * (e.g. requester-pays' `x-amz-request-payer: requester`, passed
  * through [[HttpConditionalPut]]'s `headers`) are signed verbatim.
  * Credential ROTATION is the caller's problem (env, instance
  * profile, vault) — this class only signs.
  *
  * Wire it in as the adapter's signer:
  * {{{
  *   val put = new HttpConditionalPut(
  *     key => URI.create(s"https://bucket.s3.amazonaws.com/$key"),
  *     signer = new SigV4Signer(akid, secret, "us-east-1", "s3"))
  *   Versioned.registerCasStore("s3a",
  *     new Versioned.ConditionalPutCasStore(put))
  * }}}
  */
final class SigV4Signer(
    accessKeyId: String,
    secretKey: String,
    region: String,
    service: String,
    clock: () => java.time.Instant = () => java.time.Instant.now(),
    sessionToken: Option[String] = None)
  extends HttpConditionalPut.RequestSigner {

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  private def sha256Hex(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(bytes))

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** SigV4's strict URI-encoding: unreserved characters
    * (A–Z a–z 0–9 - . _ ~) pass; everything else — including the
    * characters `java.net.URI` leaves raw in paths, like `=` `+`
    * `:` `,` — becomes uppercase %XX. Without this a Hive-style
    * path segment (`date=2020`) signs differently than the store
    * canonicalizes it and every commit dies with
    * SignatureDoesNotMatch. */
  private def uriEncode(s: String, keepSlash: Boolean): String = {
    val out = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '.' ||
          c == '_' || c == '~' || (keepSlash && c == '/'))
        out.append(c)
      else out.append(f"%%${b & 0xff}%02X")
    }
    out.toString
  }

  /** Percent-decode a raw URI component (the inverse step before
    * strict re-encoding — the raw query may already carry %XX). */
  private def uriDecode(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  /** The extra headers a signed request carries: `x-amz-date`,
    * `x-amz-content-sha256` (S3 only) and `Authorization`. */
  override def sign(method: String, uri: URI,
      headers: Seq[(String, String)],
      payload: Array[Byte]): Seq[(String, String)] = {
    val now = clock()
    val amzDate = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(now)
    val dateStamp = amzDate.substring(0, 8)
    val payloadHash = sha256Hex(payload)
    // JDK HttpClient strips scheme-default ports from the Host header
    // it puts on the wire (Http1Request.hostString), so a keyToUri
    // carrying an explicit :443/:80 must sign the bare host or every
    // request dies with SignatureDoesNotMatch
    val defaultPort = uri.getScheme match {
      case "https" => 443
      case "http" => 80
      case _ => -1
    }
    val host = uri.getHost +
      (if (uri.getPort > 0 && uri.getPort != defaultPort)
        s":${uri.getPort}" else "")
    // S3 demands the payload hash as a header; other services sign it
    // only inside the canonical request. A session token (STS /
    // instance-profile credentials) rides as x-amz-security-token,
    // INSIDE the signed set — S3 rejects an unsigned token.
    val extra =
      Seq("x-amz-date" -> amzDate) ++
        (if (service == "s3") Seq("x-amz-content-sha256" -> payloadHash)
         else Nil) ++
        sessionToken.map("x-amz-security-token" -> _).toSeq
    // duplicate names (case-insensitively) canonicalize to ONE line
    // with comma-joined values — two lines would sign a request the
    // store reconstructs differently
    val toSign = (headers ++ extra :+ ("host" -> host))
      .map { case (k, v) => (k.toLowerCase(java.util.Locale.ROOT),
        v.trim.replaceAll("\\s+", " ")) }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).mkString(",")).toSeq
      .sortBy(_._1)
    val signedHeaderNames = toSign.map(_._1).mkString(";")
    val canonicalHeaders =
      toSign.map { case (k, v) => s"$k:$v\n" }.mkString
    // query: decode each raw component, then strictly re-encode and
    // sort — the canonical form AWS re-derives server-side
    val canonicalQuery = Option(uri.getRawQuery).filter(_.nonEmpty)
      .map(_.split('&').toSeq.map { kv =>
        val i = kv.indexOf('=')
        val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
        (uriEncode(uriDecode(k), keepSlash = false),
          uriEncode(uriDecode(v), keepSlash = false))
      }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&"))
      .getOrElse("")
    // path: strict-encode each segment, slashes kept; every service
    // EXCEPT S3 additionally expects the already-encoded form encoded
    // once more (the SigV4 double-encoding rule)
    val rawPath = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    val once = uriEncode(uriDecode(rawPath), keepSlash = true)
    val canonicalUri =
      if (service == "s3") once else uriEncode(once, keepSlash = true)
    val canonicalRequest = Seq(method, canonicalUri, canonicalQuery,
      canonicalHeaders, signedHeaderNames, payloadHash).mkString("\n")
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")
    val signingKey = hmac(hmac(hmac(hmac(
      s"AWS4$secretKey".getBytes(UTF_8), dateStamp),
      region), service), "aws4_request")
    val signature = hex(hmac(signingKey, stringToSign))
    extra :+ ("Authorization" ->
      (s"AWS4-HMAC-SHA256 Credential=$accessKeyId/$scope, " +
        s"SignedHeaders=$signedHeaderNames, Signature=$signature"))
  }
}

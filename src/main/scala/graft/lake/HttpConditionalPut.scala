package graft.lake

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** A wire-level [[Versioned.ConditionalPut]] client: one HTTP `PUT`
  * of the manifest bytes with a create-if-absent precondition header
  * — the REST shape shared by every major object store's conditional
  * put:
  *
  *  - S3:         `PUT /key` + `If-None-Match: *` → `412` when the
  *                key exists (`200` = this call created it)
  *  - GCS (XML):  `PUT /key` + `x-goog-if-generation-match: 0` →
  *                `412` on existence
  *  - Azure Blob: `PUT /key` + `If-None-Match: *` → `409
  *                BlobAlreadyExists`
  *
  * Success statuses (2xx) mean THIS call created the key;
  * `412 Precondition Failed` / `409 Conflict` mean another writer
  * holds it (a lost CAS race — exactly the boolean
  * [[Versioned.ConditionalPut]] wants); anything else is an error
  * and must THROW, never report a lost race (a 500 mapped to `false`
  * would make a commit silently vanish).
  *
  * Deliberately SDK-free (the sandbox has no store SDKs; the
  * contract is the HTTP semantics, not a client library). What a
  * real deployment adds in front of this is REQUEST AUTHORIZATION —
  * SigV4 signing, OAuth bearer tokens — via `headers` (static
  * credentials / presigned-style gateways) or by signing in an
  * [[HttpConditionalPut.Transport]] wrapper; the conditional-put
  * semantics this class implements carry over unchanged, which is
  * the property [[graft.VersionedCasStoreSpec]] races pin against a
  * local emulator speaking the same wire shape.
  *
  * `keyToUri` maps a manifest key (the absolute target path
  * [[Versioned.ConditionalPutCasStore]] passes) to the object URI —
  * typically `base + path-under-bucket`.
  */
final class HttpConditionalPut(
    keyToUri: String => URI,
    precondition: (String, String) = ("If-None-Match", "*"),
    headers: Map[String, String] = Map.empty,
    timeout: Duration = Duration.ofSeconds(30),
    transport: HttpConditionalPut.Transport = null,
    signer: HttpConditionalPut.RequestSigner = null,
    method: String = "PUT")
  extends Versioned.ConditionalPut {

  private val send: HttpConditionalPut.Transport =
    Option(transport).getOrElse {
      val client = HttpClient.newBuilder().connectTimeout(timeout).build()
      req => client.send(req, HttpResponse.BodyHandlers.discarding())
        .statusCode()
    }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val uri = keyToUri(key)
    // a null precondition means the keyToUri carries it as a QUERY
    // PARAMETER (GCS JSON API's ifGenerationMatch=0) — the store-side
    // atomicity is identical, only the wire spelling differs
    val base = Option(precondition).map(p => p._1 -> p._2).toSeq ++
      headers.toSeq
    // the signer sees the REQUEST AS SENT (method, uri, headers,
    // payload) and contributes its own headers (x-amz-date,
    // x-amz-content-sha256, Authorization)
    val signed = Option(signer)
      .map(_.sign(method, uri, base, bytes)).getOrElse(Nil)
    val b = HttpRequest.newBuilder(uri)
      .timeout(timeout)
      .method(method, HttpRequest.BodyPublishers.ofByteArray(bytes))
    (base ++ signed).foreach { case (k, v) => b.header(k, v) }
    send(b.build()) match {
      case ok if ok >= 200 && ok < 300 => true // this call created it
      case 412 | 409 => false                  // exists: lost the race
      case other => throw new java.io.IOException(
        s"conditional put of $key returned HTTP $other — neither " +
          "created nor exists; refusing to guess (treating an error " +
          "as a lost race would silently drop a commit)")
    }
  }
}

object HttpConditionalPut {

  /** The GCS JSON-API dialect of the conditional put: a media upload
    * `POST {endpoint}/upload/storage/v1/b/{bucket}/o?uploadType=media
    * &name={key}&ifGenerationMatch=0` — create-if-absent spelled as a
    * QUERY-PARAMETER precondition instead of a header (`412
    * Precondition Failed` when the object exists, same one-winner
    * atomicity). `keyToName` maps the manifest key to the object name
    * (typically the path under the bucket); `headers` carries the
    * `Authorization: Bearer …` OAuth token a real deployment injects.
    */
  def gcsJson(endpoint: String, bucket: String,
      keyToName: String => String,
      headers: Map[String, String] = Map.empty,
      timeout: Duration = Duration.ofSeconds(30),
      transport: Transport = null): HttpConditionalPut = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    new HttpConditionalPut(
      key => URI.create(s"${endpoint.stripSuffix("/")}" +
        s"/upload/storage/v1/b/${enc(bucket)}/o?uploadType=media" +
        s"&name=${enc(keyToName(key))}&ifGenerationMatch=0"),
      precondition = null, headers = headers, timeout = timeout,
      transport = transport, method = "POST")
  }

  /** The request executor — swap in a test double; returns the
    * response status code. */
  trait Transport { def apply(req: HttpRequest): Int }

  /** Request authorizer: given the request as it will be sent,
    * return the extra headers that authorize it ([[SigV4Signer]] for
    * AWS; an OAuth bearer injector is one line). */
  trait RequestSigner {
    def sign(method: String, uri: URI, headers: Seq[(String, String)],
        payload: Array[Byte]): Seq[(String, String)]
  }
}

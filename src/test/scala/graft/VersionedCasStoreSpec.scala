package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path

import graft.lake.Versioned

/** The pluggable commit substrate ([[Versioned.CasStore]] registry)
  * and its object-store implementation
  * ([[Versioned.ConditionalPutCasStore]]): the commit protocol must
  * stay exactly-once when the ONLY available primitive is a strongly
  * consistent conditional put (S3 `If-None-Match: *`, GCS
  * `ifGenerationMatch=0`) — no rename, no hard link, no lock, no
  * lease. The client here is an injected double whose atomicity is
  * one `ConcurrentHashMap.putIfAbsent` (the store-side claim); a won
  * claim writes the manifest through so readers see it, a lost claim
  * writes nothing — the exact observable contract of the real APIs.
  */
class VersionedCasStoreSpec extends SparkSuite {

  /** Conditional-put double: map claim = the store's atomic
    * create-if-absent; write-through on a won claim only. */
  private final class MemoryConditionalPut
    extends Versioned.ConditionalPut {
    val claims = new ConcurrentHashMap[String, Boolean]()
    val puts = new AtomicInteger(0)
    val lost = new AtomicInteger(0)
    override def putIfAbsent(key: String,
        bytes: Array[Byte]): Boolean = {
      puts.incrementAndGet()
      if (claims.putIfAbsent(key, true) == null) {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(new Path(key).toUri.getPath), bytes,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } else { lost.incrementAndGet(); false }
    }
  }

  test("racing appends through a conditional-put-only store commit " +
      "exactly once each, versions contiguous") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/t"
    val client = new MemoryConditionalPut
    Versioned.registerCasStore(dir, new Versioned.ConditionalPutCasStore(
      client))
    try {
      Versioned.commit(s, dir, Seq((-1L, -1L)).toDF("w", "i")) // v0
      val writers = 4
      val perWriter = 5
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (0 until writers).map { w =>
        new Thread(() =>
          try {
            for (i <- 0 until perWriter)
              Versioned.commit(s, dir,
                Seq((w.toLong, i.toLong)).toDF("w", "i"))
          } catch { case t: Throwable => errs.add(t) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
      // every commit landed exactly once, versions contiguous
      assert(Versioned.latestVersion(s, dir)
        .contains(writers * perWriter))
      val rows = Versioned.read(s, dir).as[(Long, Long)].collect()
      assert(rows.length == writers * perWriter + 1)
      assert(rows.toSet.size == rows.length, "a commit landed twice")
      // the registered store really carried the publishes: one claim
      // per version, retries visible as lost puts
      assert(client.claims.size() == writers * perWriter + 1)
      assert(client.puts.get() >= writers * perWriter + 1)
      assert(client.puts.get() ==
        writers * perWriter + 1 + client.lost.get())
      // every version stays readable through the normal path
      assert(Versioned.read(s, dir, Some(0)).count() == 1)
    } finally Versioned.unregisterCasStore(dir)
  }

  test("registry routing: longest path prefix wins; unregistered " +
      "tables keep the built-in store") {
    val s = spark
    import s.implicits._
    val root = tmpDir()
    val a = s"$root/wh/a"
    val b = s"$root/wh/b"
    val whClient = new MemoryConditionalPut
    val aClient = new MemoryConditionalPut
    Versioned.registerCasStore(s"$root/wh",
      new Versioned.ConditionalPutCasStore(whClient))
    Versioned.registerCasStore(a,
      new Versioned.ConditionalPutCasStore(aClient))
    try {
      Versioned.commit(s, a, Seq(1L).toDF("x"))
      Versioned.commit(s, b, Seq(2L).toDF("x"))
      assert(aClient.puts.get() == 1,
        "table-scoped registration must shadow the warehouse prefix")
      assert(whClient.puts.get() == 1)
      // a registration for .../a must NOT capture the sibling .../a2
      // (prefix matches end at a path-segment boundary)
      Versioned.commit(s, s"$root/wh/a2", Seq(4L).toDF("x"))
      assert(aClient.puts.get() == 1,
        "table-prefix registration captured a sibling table")
      assert(whClient.puts.get() == 2,
        "the sibling must fall through to the warehouse prefix")
      val c = s"$root/elsewhere/c"
      Versioned.commit(s, c, Seq(3L).toDF("x"))
      assert(aClient.puts.get() == 1 && whClient.puts.get() == 2,
        "an unregistered table must not route through the registry")
      assert(Versioned.read(s, c).count() == 1)
    } finally {
      Versioned.unregisterCasStore(s"$root/wh")
      Versioned.unregisterCasStore(a)
    }
  }

  test("link-published commits leave no orphaned .crc sidecars in " +
      "_manifest") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/crc"
    // LinkCasStore is the local-FS default: each commit stages a tmp
    // through ChecksumFileSystem (which shadows it with a .crc
    // sidecar) and publishes via link(2) + NIO delete — the sidecar
    // must be removed explicitly or _manifest grows one orphan per
    // commit forever
    (1 to 5).foreach(i => Versioned.commit(s, dir, Seq(i.toLong).toDF("x")))
    val names = java.nio.file.Files.list(
        java.nio.file.Paths.get(dir, "_manifest"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
    assert(names.count(_.endsWith(".crc")) == 0,
      s"orphaned crc sidecars after 5 commits: ${names.mkString(", ")}")
    assert(names.count(_.matches("v\\d{5}\\.txt")) == 5)
  }
}

package graft

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.log.{EventLog, MiniObjectStore, PushBridge, S3xFileSystem, TxnLog}
import graft.model.Record

/** The cloud tier exercised against a REAL in-process object store
  * (MiniObjectStore + S3xFileSystem), not a local-FS subclass: every
  * byte crosses an HTTP socket, the keyspace is flat, rename does not
  * exist as a verb (the client copies then deletes, object by object),
  * reads are ranged GETs and listing is prefix+delimiter. The `mock3://`
  * twin (ObjectStoreFsSpec) checks the same lifecycle on a scheme'd
  * local FS; this spec removes the last simulation: there is no shared
  * filesystem, no inode tree, and no atomic anything behind the store.
  * Reference: server/azure/blob_provider.go:1 (the reference's real
  * cloud backend has exactly these semantics). */
class HttpObjectStoreSpec extends SparkSpec {

  private def withStore(f: (MiniObjectStore, String) => Unit): Unit = {
    val store = MiniObjectStore.start()
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.s3x.impl", classOf[S3xFileSystem].getName)
      f(store, s"s3x://${store.endpoint}/logs/run")
    } finally store.close()
  }

  private def records(from: Long, n: Long) = {
    import spark.implicits._
    spark.createDataset((from until from + n).map(i => Record(i, s"payload $i")))
  }

  test("store contract: flat keys, copy+delete rename, ranged reads over HTTP") {
    withStore { (store, root) =>
      val conf = new Configuration()
      conf.set("fs.s3x.impl", classOf[S3xFileSystem].getName)
      val fs = new HPath(root).getFileSystem(conf)
      // write / read bytes through the wire
      val p = new HPath(s"$root/a/b/file.txt")
      val out = fs.create(p, true)
      out.write("hello object store".getBytes("UTF-8")); out.close()
      assert(fs.getFileStatus(p).getLen == 18L)
      // implicit directories: a/ and a/b/ exist only because the key does
      assert(fs.getFileStatus(new HPath(s"$root/a")).isDirectory)
      assert(fs.listStatus(new HPath(s"$root/a")).map(_.getPath.getName).toSeq == Seq("b"))
      // ranged read: seek into the middle, fetch a slice
      val in = fs.open(p)
      in.seek(6L)
      val buf = new Array[Byte](6)
      in.readFully(6L, buf)
      assert(new String(buf, "UTF-8") == "object")
      in.close()
      assert(store.rangedGets.get() > 0, "reads must be ranged GETs")
      // rename is copy+delete per object: same count, different keys
      val before = store.objectCount
      assert(fs.rename(new HPath(s"$root/a"), new HPath(s"$root/z")))
      assert(store.objectCount == before)
      assert(store.keys.exists(_.endsWith("z/b/file.txt")))
      assert(!store.keys.exists(_.contains("a/b/file.txt")))
      assert(!fs.exists(new HPath(s"$root/a/b/file.txt")))
      assert(fs.getFileStatus(new HPath(s"$root/z/b/file.txt")).getLen == 18L)
      // delete(recursive) sweeps the prefix
      assert(fs.delete(new HPath(s"$root/z"), true))
      assert(!fs.exists(new HPath(s"$root/z")))
    }
  }

  test("full lifecycle over HTTP: produce, peek, consume, compact, retain") {
    withStore { (store, root) =>
      val log = new EventLog(spark, root)
      for (i <- 0 until 3)
        log.produce("s0", "seg0", records(1 + i * 10, 10), 1000L * (i + 1))
      log.produce("logs/2026=a", "seg0", records(1, 5), 1000L)
      assert(log.peek("s0", "seg0").get.sequence == 30L)
      assert(log.consumeSegment("s0", "seg0").count() == 30L)
      assert(log.consumeSpace("logs/2026=a").count() == 5L)
      assert(store.rangedGets.get() > 0, "parquet scans must read ranged")
      assert(log.compact("s0") == 1)
      assert(log.consumeSegment("s0", "seg0").count() == 30L)
      log.retain("s0", minTimestamp = 2000L)
      val kept = log.consumeSegment("s0", "seg0").collect()
      assert(kept.map(_.getAs[Long]("sequence")).sorted.toSeq == (11L to 30L))
      assert(log.compact("logs/2026=a") == 1)
      assert(log.consumeSpace("logs/2026=a").count() == 5L)
    }
  }

  test("transactions over HTTP: staged invisible, commit resumes, abort purges") {
    withStore { (_, root) =>
      val log = new EventLog(spark, root)
      val txn = new TxnLog(log)
      log.produce("s0", "seg0", records(1, 5), 1000L)
      txn.write("trx-a", "s0", "seg0", records(6, 5), 2000L, trxNumber = 2L)
      assert(log.consumeSegment("s0", "seg0").count() == 5)
      txn.commit("trx-a")
      assert(log.consumeSegment("s0", "seg0").count() == 10)
      intercept[IllegalArgumentException](txn.commit("trx-a"))
      txn.write("trx-b", "s0", "seg0", records(11, 5), 3000L, trxNumber = 3L)
      txn.abort("trx-b")
      assert(log.consumeSegment("s0", "seg0").count() == 10)
    }
  }

  test("interrupted compaction recovers both directions on the object store") {
    withStore { (_, root) =>
      val log = new EventLog(spark, root)
      for (i <- 0 until 3)
        log.produce("s0", "seg0", records(1 + i * 10, 10), 1000L * (i + 1))
      val before = log.consumeSegment("s0", "seg0").collect().map(_.toSeq).toSet
      log.compactFailpoint = Some("after-moves")
      intercept[IllegalStateException](log.compact("s0"))
      log.compactFailpoint = None
      log.recoverCompaction("s0")
      assert(log.consumeSegment("s0", "seg0").collect().map(_.toSeq).toSet == before)
      log.compactFailpoint = Some("after-marker")
      intercept[IllegalStateException](log.compact("s0"))
      log.compactFailpoint = None
      assert(log.compact("s0") == 1)
      assert(log.consumeSegment("s0", "seg0").collect().map(_.toSeq).toSet == before)
    }
  }

  test("push mailbox over HTTP: acks reach a foreign-handle subscriber") {
    withStore { (_, root) =>
      val log = new EventLog(spark, root)
      val pub = PushBridge.publisher(log)
      // the "other process": its own FileSystem handle from a bare conf
      val conf = new Configuration()
      conf.set("fs.s3x.impl", classOf[S3xFileSystem].getName)
      val foreign: FileSystem = new HPath(root).getFileSystem(conf)
      val got = mutable.Buffer.empty[graft.model.SegmentStatus]
      val sub = PushBridge.subscriber(foreign, root) { st =>
        got.synchronized { got += st; () }
      }
      try {
        assert(sub.awaitReady())
        val statuses =
          log.produce("s0", "seg0", records(1, 250), 1000L, chunkSize = 100)
        assert(statuses.size == 3)
        val deadline = System.currentTimeMillis() + 30000L
        while (got.synchronized(got.size) < 3 &&
               System.currentTimeMillis() < deadline) Thread.sleep(20)
        assert(got.synchronized(got.toSeq) == statuses,
          "mailbox over the object store must deliver the exact acks in order")
      } finally { sub.close(); pub.close() }
    }
  }
}

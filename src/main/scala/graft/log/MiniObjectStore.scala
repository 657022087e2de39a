package graft.log

import java.io.ByteArrayOutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process object store speaking real HTTP — the test double for the
  * store's cloud tier (reference: server/azure/blob_provider.go:1 is the
  * reference's real cloud backend; this is its semantic twin for tests).
  *
  * Unlike the in-JVM `mock3://` mock (a RawLocalFileSystem subclass),
  * nothing here shares state with the client except sockets: every byte
  * crosses an HTTP boundary, the keyspace is FLAT (no directories — a
  * "directory" exists only as a key prefix), rename does not exist as a
  * verb (clients must copy+delete, exactly S3's contract), reads are
  * ranged GETs, and listing is prefix+delimiter. List-after-write is
  * strongly consistent (modern S3 semantics).
  *
  * Wire API (query-param addressing; S3 semantics, not S3 wire format):
  *   GET    /obj?key=K         → 200 bytes (Range: bytes=a-b honored → 206)
  *   HEAD   /obj?key=K         → 200 (x-olen, x-mtime headers) | 404
  *   PUT    /obj?key=K         → 200; body = content; header
  *                               x-copy-from: SRC → server-side copy
  *   DELETE /obj?key=K         → 204 (idempotent)
  *   GET    /list?prefix=P&delim=1 → text: `O <len> <mtime> <key>` lines
  *                               and `P <commonPrefix>` lines; delim=0
  *                               lists every object under P recursively.
  */
final class MiniObjectStore {

  import MiniObjectStore.Obj
  private val objects = new ConcurrentHashMap[String, Obj]()
  private val clock = new AtomicLong(System.currentTimeMillis())
  // server-side mtimes, wall-clock anchored (the log's crashed-producer
  // sweep age-gates on them) but strictly monotonic so same-millisecond
  // writes still order deterministically
  private def nextMtime(): Long =
    clock.updateAndGet(c => math.max(c + 1, System.currentTimeMillis()))

  /** Test hook: count of GET-with-Range requests served (lets specs
    * assert parquet reads go through ranged reads, not whole-object). */
  val rangedGets = new AtomicLong(0L)
  val putCount = new AtomicLong(0L)

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    s.createContext("/obj", ObjHandler)
    s.createContext("/list", ListHandler)
    s.start()
    s
  }

  def port: Int = server.getAddress.getPort
  def endpoint: String = s"127.0.0.1:$port"
  def close(): Unit = server.stop(0)
  def objectCount: Int = objects.size()
  def keys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.toSeq.sorted
  }

  private def query(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) (URLDecoder.decode(kv, "UTF-8"), "")
      else
        (URLDecoder.decode(kv.take(i), "UTF-8"),
         URLDecoder.decode(kv.drop(i + 1), "UTF-8"))
    }.toMap
  }

  private def readBody(ex: HttpExchange): Array[Byte] = {
    val in = ex.getRequestBody
    val buf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](64 * 1024)
    var n = in.read(tmp)
    while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    buf.toByteArray
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private object ObjHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val key = query(ex).getOrElse("key", "")
        ex.getRequestMethod match {
          case "PUT" =>
            val copyFrom = Option(ex.getRequestHeaders.getFirst("x-copy-from"))
            readBody(ex) match {
              case body =>
                copyFrom match {
                  case Some(src) =>
                    Option(objects.get(src)) match {
                      case Some(o) =>
                        objects.put(key, Obj(o.bytes, nextMtime()))
                        respond(ex, 200, Array.emptyByteArray)
                      case None => respond(ex, 404, Array.emptyByteArray)
                    }
                  case None =>
                    putCount.incrementAndGet()
                    objects.put(key, Obj(body, nextMtime()))
                    respond(ex, 200, Array.emptyByteArray)
                }
            }
          case "HEAD" =>
            Option(objects.get(key)) match {
              case Some(o) =>
                ex.getResponseHeaders.set("x-olen", o.bytes.length.toString)
                ex.getResponseHeaders.set("x-mtime", o.mtime.toString)
                respond(ex, 200, Array.emptyByteArray)
              case None => respond(ex, 404, Array.emptyByteArray)
            }
          case "GET" =>
            Option(objects.get(key)) match {
              case Some(o) =>
                Option(ex.getRequestHeaders.getFirst("Range")) match {
                  case Some(r) if r.startsWith("bytes=") =>
                    rangedGets.incrementAndGet()
                    val Array(a, b) = r.stripPrefix("bytes=").split("-", 2)
                    val start = a.toLong
                    val endIncl =
                      if (b.isEmpty) o.bytes.length - 1L
                      else math.min(b.toLong, o.bytes.length - 1L)
                    if (start > endIncl) respond(ex, 206, Array.emptyByteArray)
                    else
                      respond(ex, 206,
                        java.util.Arrays.copyOfRange(
                          o.bytes, start.toInt, endIncl.toInt + 1))
                  case _ => respond(ex, 200, o.bytes)
                }
              case None => respond(ex, 404, Array.emptyByteArray)
            }
          case "DELETE" =>
            objects.remove(key)
            respond(ex, 204, Array.emptyByteArray)
          case _ => respond(ex, 405, Array.emptyByteArray)
        }
      } catch {
        case t: Throwable => respond(ex, 500, t.toString.getBytes(UTF_8))
      }
  }

  private object ListHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        import scala.jdk.CollectionConverters._
        val q = query(ex)
        val prefix = q.getOrElse("prefix", "")
        val delimited = q.get("delim").contains("1")
        val sb = new StringBuilder
        if (delimited) {
          val prefixes = scala.collection.mutable.SortedSet[String]()
          val objs = scala.collection.mutable.SortedMap[String, Obj]()
          objects.entrySet().asScala.foreach { e =>
            val k = e.getKey
            if (k.startsWith(prefix)) {
              val rest = k.drop(prefix.length)
              val slash = rest.indexOf('/')
              if (slash >= 0) prefixes += prefix + rest.take(slash + 1)
              else objs += (k -> e.getValue)
            }
          }
          prefixes.foreach(p => sb.append("P ").append(p).append('\n'))
          objs.foreach { case (k, o) =>
            sb.append(s"O ${o.bytes.length} ${o.mtime} $k\n")
          }
        } else {
          objects.entrySet().asScala.toSeq
            .filter(_.getKey.startsWith(prefix))
            .sortBy(_.getKey)
            .foreach { e =>
              val o = e.getValue
              sb.append(s"O ${o.bytes.length} ${o.mtime} ${e.getKey}\n")
            }
        }
        respond(ex, 200, sb.toString.getBytes(UTF_8))
      } catch {
        case t: Throwable => respond(ex, 500, t.toString.getBytes(UTF_8))
      }
  }
}

object MiniObjectStore {
  def start(): MiniObjectStore = new MiniObjectStore

  // companion-level so the pattern-match type test needs no outer ref
  private[log] final case class Obj(bytes: Array[Byte], mtime: Long)
}

package graft.tools

import java.net.URI
import java.util.Collections
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, RawLocalFileSystem, Seekable}

/** Local FileSystem with injectable per-open latency — an object-store
  * stand-in for [[ScanBench]]: every `open` (one GET) first sleeps
  * [[LatencyFileSystem.latencyMs]] and is counted, so a scan's cost
  * model under S3-like first-byte latency can be MEASURED locally
  * (total time ≈ GETs × latency / parallelism) instead of argued.
  * Bytes read through each stream are counted per path (the metric
  * ranged shard reads improve), and an optional per-stream bandwidth
  * cap ([[LatencyFileSystem.bandwidthMBps]]) models object-store
  * streaming throughput so byte savings show up in wall time too.
  * Resolved via `fs.graftlat.impl`; writes are not delayed (store
  * builds are setup, not the thing under measurement). */
class LatencyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftlat"
  override def getUri: URI = URI.create("graftlat:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val path = f.toUri.getPath
    LatencyFileSystem.opened.add(path)
    val ms = LatencyFileSystem.latencyMs.get()
    if (ms > 0) Thread.sleep(ms.toLong)
    val inner = super.open(f, bufferSize)
    new FSDataInputStream(new LatencyFileSystem.CountingStream(inner, path))
  }
}

object LatencyFileSystem {
  val latencyMs = new AtomicInteger(0)
  /** Per-stream streaming bandwidth model in MB/s; 0 = unthrottled. */
  val bandwidthMBps = new AtomicInteger(0)
  val opened: java.util.List[String] =
    Collections.synchronizedList(new java.util.ArrayList[String]())
  private val bytesByPath = new ConcurrentHashMap[String, AtomicLong]()

  def reset(ms: Int, mbps: Int = 0): Unit = {
    latencyMs.set(ms)
    bandwidthMBps.set(mbps)
    opened.clear()
    bytesByPath.clear()
  }

  /** Delegating stream that counts (and optionally throttles) every byte
    * read, positioned or sequential. The throttle accumulates owed time
    * per stream and sleeps in ≥1 ms slices — individual reads arrive in
    * ≤buffer-size pieces whose owed time rounds to zero. */
  private final class CountingStream(inner: FSDataInputStream, path: String)
      extends java.io.InputStream with Seekable with PositionedReadable {
    private var owedNanos = 0.0

    private def addBytes(n: Int): Unit = if (n > 0) {
      bytesByPath.computeIfAbsent(path, _ => new AtomicLong()).addAndGet(n.toLong)
      val mbps = bandwidthMBps.get()
      if (mbps > 0) {
        owedNanos += n * (1e9 / (mbps * 1048576.0)) // ns per byte at mbps MiB/s
        if (owedNanos >= 1e6) {
          val ms = (owedNanos / 1e6).toLong
          owedNanos -= ms * 1e6
          Thread.sleep(ms)
        }
      }
    }

    override def read(): Int = {
      val b = inner.read()
      if (b >= 0) addBytes(1)
      b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = inner.read(b, off, len)
      if (n > 0) addBytes(n)
      n
    }
    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      val n = inner.read(position, buffer, offset, length)
      if (n > 0) addBytes(n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      inner.readFully(position, buffer, offset, length)
      addBytes(length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
    override def seek(pos: Long): Unit = inner.seek(pos)
    override def getPos: Long = inner.getPos
    override def seekToNewSource(targetPos: Long): Boolean = inner.seekToNewSource(targetPos)
    override def available(): Int = inner.available()
    override def close(): Unit = inner.close()
  }

  private def chunkPath(store: String, p: String): Boolean =
    p.contains(s"/$store/") && p.matches(".*/(c|c\\.part[^/]*)/\\d+(/\\d+)*$")

  /** Opens of chunk data objects under `store` (metadata and sidecar
    * segments excluded) — the number a real object store would bill.
    * Matches canonical `c/<ord>` keys (N-D: `c/<i>/<j>/...`) and the
    * manifest-keyed `c.part<writeId>-<pid>/<j>` layout of staged
    * commits. */
  def chunkGets(store: String): Int =
    opened.toArray.map(_.toString).count(chunkPath(store, _))

  /** Bytes read from chunk data objects under `store` — what an object
    * store would transfer (and bill) for the scan's data GETs. */
  def chunkBytes(store: String): Long = {
    var total = 0L
    bytesByPath.forEach { (p, n) => if (chunkPath(store, p)) total += n.get() }
    total
  }

  /** All opens under `store` (chunks + metadata + sidecar). */
  def allGets(store: String): Int =
    opened.toArray.map(_.toString).count(_.contains(s"/$store/"))
}

package graft.tools

import java.net.URI
import java.util.Collections
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** Local FileSystem with injectable per-open latency — an object-store
  * stand-in for [[ScanBench]]: every `open` (one GET) first sleeps
  * [[LatencyFileSystem.latencyMs]] and is counted, so a scan's cost
  * model under S3-like first-byte latency can be MEASURED locally
  * (total time ≈ GETs × latency / parallelism) instead of argued.
  * Resolved via `fs.graftlat.impl`; writes are not delayed (store
  * builds are setup, not the thing under measurement). */
class LatencyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftlat"
  override def getUri: URI = URI.create("graftlat:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    LatencyFileSystem.opened.add(f.toUri.getPath)
    val ms = LatencyFileSystem.latencyMs.get()
    if (ms > 0) Thread.sleep(ms.toLong)
    super.open(f, bufferSize)
  }
}

object LatencyFileSystem {
  val latencyMs = new AtomicInteger(0)
  val opened: java.util.List[String] =
    Collections.synchronizedList(new java.util.ArrayList[String]())

  def reset(ms: Int): Unit = { latencyMs.set(ms); opened.clear() }

  /** Opens of chunk data objects under `store` (metadata and sidecar
    * segments excluded) — the number a real object store would bill.
    * Matches canonical `c/<ord>` keys (N-D: `c/<i>/<j>/...`) and the
    * manifest-keyed `c.part<writeId>-<pid>/<j>` layout of staged
    * commits. */
  def chunkGets(store: String): Int =
    opened.toArray.map(_.toString)
      .count(p => p.contains(s"/$store/") &&
        p.matches(".*/(c|c\\.part[^/]*)/\\d+(/\\d+)*$"))

  /** All opens under `store` (chunks + metadata + sidecar). */
  def allGets(store: String): Int =
    opened.toArray.map(_.toString).count(_.contains(s"/$store/"))
}

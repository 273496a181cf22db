package graft.tools

import java.net.URI

import org.apache.hadoop.fs.{EtagSource, FileStatus, Path, RawLocalFileSystem}

/** Local FileSystem whose file statuses expose a CONTENT-DERIVED etag
  * (Hadoop 3.4 [[EtagSource]]) — an S3A/ABFS stand-in for the inner-doc
  * freshness guard's third token. Real object-store etags change on any
  * content rewrite while object length (constant-length encodings) and
  * modification time (one-second granularity on S3-style stores) may
  * not; this FS reproduces that property locally with a CRC32 of the
  * file bytes, so the granule-aliased-rewrite adversary can be PINNED
  * instead of argued. Files here are tiny fixtures — the per-status
  * hash is a test cost, not a pattern for production FileSystems
  * (which carry the etag in the LIST/HEAD response for free).
  * Resolved via `fs.graftetag.impl`. */
class EtagFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftetag"
  override def getUri: URI = URI.create("graftetag:///")

  override def getFileStatus(f: Path): FileStatus = {
    val st = super.getFileStatus(f)
    if (st.isDirectory) st
    else new EtagFileSystem.TaggedStatus(st, EtagFileSystem.contentTag(st))
  }
}

object EtagFileSystem {
  private def contentTag(st: FileStatus): String = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(st.getPath.toUri.getPath))
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    java.lang.Long.toHexString(crc.getValue)
  }

  // plain-field construction: the FileStatus COPY constructor calls
  // getPermission, whose RawLocal lazy loader resolves the path through
  // java.io.File and rejects any scheme but file://
  private final class TaggedStatus(st: FileStatus, tag: String)
      extends FileStatus(st.getLen, st.isDirectory, st.getReplication,
        st.getBlockSize, st.getModificationTime, st.getAccessTime,
        null, null, null, st.getPath) with EtagSource {
    override def getEtag: String = tag
  }
}

package graft.fs

import java.nio.file.{Path, Paths}

/** Local-directory resolution for the file-per-entry sidecar writers
  * (audit dir, job-stats dir): absolute local paths, relative paths
  * (resolved against the CWD), or file: URIs. Any other scheme fails
  * loudly here instead of as an nio provider error mid-append. */
object LocalDirs {
  def resolve(dir: String): Path =
    if (dir.startsWith("file:")) Paths.get(java.net.URI.create(dir))
    else if (dir.contains("://"))
      throw new IllegalArgumentException(
        s"sidecar dir must be a local path or file: URI, got $dir")
    else Paths.get(dir).toAbsolutePath
}

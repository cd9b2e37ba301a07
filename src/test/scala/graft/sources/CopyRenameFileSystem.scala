package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test shim with OBJECT-STORE rename semantics (the S3A/GCS model):
  * `rename` is a client-side exists-check + copy + delete — NOT an
  * atomic no-clobber primitive — while object VISIBILITY stays atomic
  * (a destination appears whole or not at all, like an S3 PUT/COPY;
  * the staging+ATOMIC_MOVE below models that). A deliberate sleep
  * between the check and the copy widens the race window so a soak
  * can actually hit it. `getScheme`/`getUri` report `glcopy`, so
  * GraftLines' local-FS link(2) CAS is NOT taken and the publish path
  * exercises exactly what a real object store would.
  *
  * Registered per-test via `fs.glcopy.impl`; paths look like
  * `glcopy:/abs/local/path` and are backed by the local disk. */
class CopyRenameFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "glcopy"
  override def getUri: URI = URI.create("glcopy:///")

  private val rnd = new java.util.Random()

  override def delete(p: Path, recursive: Boolean): Boolean = {
    // simulated failing DELETE for data files (the retention tests):
    // reports false with the file left on disk — the quiet failure
    // mode expireVersions/compact must detect, not assume away
    if (CopyRenameFileSystem.failDataFileDeletes.get()
        && p.getName.endsWith(".gl")) return false
    super.delete(p, recursive)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    // simulated store outage for manifest publishes (the in-doubt
    // test): every rename TOWARD a generation manifest fails, exactly
    // as an object store mid-outage fails its COPY — the claim is
    // already placed, so the commit must go in doubt, not lost
    if (CopyRenameFileSystem.failManifestPublishes.get()
        && dst.getName.startsWith("_graft_gen.")
        && !dst.getName.contains(".tmp")) return false
    if (exists(dst)) return false                 // the check...
    if (!exists(src)) return false
    if (getFileStatus(src).isDirectory)
      return super.rename(src, dst)               // (dirs: out of scope)
    try Thread.sleep(1 + rnd.nextInt(8))          // ...then the window...
    catch { case _: InterruptedException => Thread.currentThread.interrupt() }
    // ...then the non-CAS copy, with atomic whole-object visibility
    val srcFile = pathToFile(src).toPath
    val dstFile = pathToFile(dst).toPath
    val hidden = dstFile.resolveSibling(
      "." + dstFile.getFileName + "." + java.util.UUID.randomUUID() + ".cprn")
    try {
      java.nio.file.Files.copy(srcFile, hidden)
      java.nio.file.Files.move(hidden, dstFile,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case _: java.io.IOException =>
        try java.nio.file.Files.deleteIfExists(hidden)
        catch { case _: Exception => () }
        return false
    }
    delete(src, false)
    true
  }
}

object CopyRenameFileSystem {
  /** When set, every rename that would PUBLISH a generation manifest
    * fails (returns false) — the simulated outage window for the
    * in-doubt commit test. Staged/tmp writes still succeed, exactly
    * like a store whose PUTs work but whose publish COPY is failing. */
  val failManifestPublishes = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** When set, deleting any `.gl` data file returns false with the
    * file left in place — the silent-failure mode whose detection the
    * retention paths are tested on. */
  val failDataFileDeletes = new java.util.concurrent.atomic.AtomicBoolean(false)
}

package graft

/** Scratch locations for run droppings (warehouses, the Derby boot
  * log). Derived from `java.io.tmpdir` + the current user, never a
  * bare shared `/tmp/...` name: on a multi-user host a path created by
  * the first user would fail every other user's run with permission
  * denied, and a respected `java.io.tmpdir` keeps CI sandboxes
  * self-contained. Deterministic per user (not per run) so repeated
  * local runs reuse rather than accumulate — EXCEPT when the
  * deterministic path is squatted (pre-created by another user, or a
  * symlink planted under the world-writable tmp root), in which case
  * a per-run private directory is used instead of handing an
  * attacker-controlled path to Derby and the warehouses. */
object GraftTmp {

  private lazy val root: java.nio.file.Path = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/")
    val user = sys.props.getOrElse("user.name", "nouser")
    val want = java.nio.file.Paths.get(s"$base/graft_$user")
    def ownedByUs(p: java.nio.file.Path): Boolean =
      try {
        !java.nio.file.Files.isSymbolicLink(p) &&
          java.nio.file.Files.isDirectory(p,
            java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
          java.nio.file.Files.getOwner(p).getName == user
      } catch { case _: Exception => false }
    try {
      if (!java.nio.file.Files.exists(want,
          java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        // atomic create-or-fail; a racer/squatter landing first is
        // caught by the ownership check below
        try java.nio.file.Files.createDirectory(want)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
      if (ownedByUs(want)) want
      else java.nio.file.Files.createTempDirectory("graft_")
    } catch {
      case _: Exception => java.nio.file.Files.createTempDirectory("graft_")
    }
  }

  def dir(name: String): String = s"${root.toString}/$name"
}

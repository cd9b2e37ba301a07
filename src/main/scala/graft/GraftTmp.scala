package graft

/** Scratch locations for run droppings (warehouses, the Derby boot
  * log). Derived from `java.io.tmpdir` + the current user, never a
  * bare shared `/tmp/...` name: on a multi-user host a path created by
  * the first user would fail every other user's run with permission
  * denied, and a respected `java.io.tmpdir` keeps CI sandboxes
  * self-contained. Deterministic per user (not per run) so repeated
  * local runs reuse rather than accumulate. */
object GraftTmp {
  def dir(name: String): String = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
      .stripSuffix("/")
    val user = sys.props.getOrElse("user.name", "nouser")
    val root = new java.io.File(s"$base/graft_$user")
    // consumers hand the path to code that won't mkdir for itself
    // (Derby's log writer); creating the per-user root here is cheap
    root.mkdirs()
    s"${root.getPath}/$name"
  }
}

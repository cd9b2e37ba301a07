package graft.sources

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Object-store-safe generation-commit arbitration for graftlines
  * (r11 VERDICT #1).
  *
  * The default publish protocol CASes on the FILESYSTEM: link(2) on
  * local mounts, atomic no-clobber rename on HDFS. Object-store
  * connectors (S3A, GCS) implement rename as a client-side
  * exists-check + copy, so the filesystem CAS silently degrades to
  * best-effort — two committers that both computed generation `n` can
  * last-writer-win and LOSE a commit. This coordinator moves the CAS
  * off the filesystem into an external arbiter with a real atomic
  * primitive: a JDBC table with a `(dir, gen)` primary key, the same
  * shape as the public Delta-on-S3 answer (a DynamoDB conditional PUT
  * arbitrating `(tablePath, version)`), reachable from any committer.
  *
  * Protocol (per generation publish; the manifest tmp file is already
  * fully written and durable before this runs):
  *
  *   1. CLAIM: `INSERT (dir, gen, tmp, complete=0)` — the primary key
  *      makes exactly one committer win generation `gen`. The claim
  *      records the winner's tmp MANIFEST NAME, which is what makes
  *      every later step clobber-safe: anyone who publishes `gen`
  *      publishes those exact bytes, so a racing copy is idempontent,
  *      never a lost commit.
  *   2. PUBLISH: rename tmp -> final manifest name. Exclusive by the
  *      claim; even a copy-implemented rename is safe.
  *   3. SEAL: `UPDATE complete=1`, then best-effort delete of the tmp.
  *
  * A LOSING claim (PK conflict) reads the winning row:
  *   - manifest on disk, or `complete=1`: a normal lost race — the
  *     loud "concurrent committers" error the callers' retry loops
  *     already handle (recompute the next generation, restage, retry).
  *   - manifest missing and `complete=0`: the winner crashed between
  *     claim and publish. RECOVER: copy the RECORDED tmp (durable,
  *     complete at claim time) to the final name, seal the row, then
  *     fail loudly anyway — the loser's own commit still lost the
  *     race for `gen` and must retry at `gen + 1`. Recovery publishes
  *     the crashed winner's commit, exactly like Delta's "fix the
  *     log" pass; a client that died mid-commit may thus still have
  *     its commit land (standard in-doubt semantics).
  *
  * Crash matrix: claim+crash -> recovered by the next conflicting
  * committer (identical bytes, any number of racing recoverers).
  * Publish+crash-before-seal -> manifest exists; conflicters see it
  * and fail loudly; the row is sealed opportunistically. Publish
  * FAILURE (transient IO) -> the winner rolls the claim back
  * (`DELETE ... complete=0`) so the generation is cleanly retryable;
  * if even the rollback fails the claim stays and recovery applies.
  *
  * Selection is per-table-commit via Hadoop conf (set
  * `spark.hadoop.*` on the session or per-op): {{{
  *   graft.lines.commit.coordinator = fs | jdbc      (default fs)
  *   graft.lines.commit.jdbc.url    = jdbc:...       (required for jdbc)
  *   graft.lines.commit.jdbc.driver = <class>        (optional)
  * }}}
  * `fs` is today's filesystem CAS — correct on local mounts and HDFS.
  * `jdbc` is for stores without an atomic no-clobber rename; in
  * production the URL points at a shared database (the one system of
  * record a 1000-executor deployment already has: its catalog), and
  * only the DRIVER connects — generation publish is a per-job-commit,
  * driver-side event, so the arbiter sees O(commits) traffic, never
  * O(tasks).
  *
  * The claims table grows one row per committed generation — the same
  * O(generations) metadata the manifests themselves already cost; a
  * deployment that prunes old generations with expireVersions can
  * prune sealed claim rows below the retention floor on the same
  * schedule (a sealed row is never consulted again: conflicts resolve
  * against the manifest on disk first).
  */
private[sources] object GlCommitCoordinator {

  val ModeKey = "graft.lines.commit.coordinator"
  val UrlKey = "graft.lines.commit.jdbc.url"
  val DriverKey = "graft.lines.commit.jdbc.driver"

  /** The arbitrated publisher for `conf`, or None for the default
    * filesystem-CAS path. An unknown mode fails loudly — silently
    * falling back to `fs` on a typo would hand an object-store table
    * exactly the lost-commit window the setting exists to close. */
  def forConf(conf: Configuration): Option[JdbcCoordinator] =
    conf.get(ModeKey, "fs") match {
      case "fs" => None
      case "jdbc" =>
        val url = conf.get(UrlKey)
        require(url != null && url.nonEmpty,
          s"graftlines: $ModeKey=jdbc requires $UrlKey")
        Some(new JdbcCoordinator(url, Option(conf.get(DriverKey))))
      case other =>
        throw new IllegalArgumentException(
          s"graftlines: unknown $ModeKey '$other' (expected fs or jdbc)")
    }
}

private[sources] final class JdbcCoordinator(url: String,
    driver: Option[String]) {

  import GlCommitCoordinator._

  private def connect(): Connection = {
    driver.foreach(Class.forName)
    DriverManager.getConnection(url)
  }

  /** 23505 is the SQL-standard unique-violation SQLState (Derby,
    * Postgres, H2); fall back to the JDBC exception subclass for
    * drivers that subclass instead. */
  private def isDup(e: SQLException): Boolean =
    "23505" == e.getSQLState ||
      e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException]

  private def ensureTable(c: Connection): Unit = {
    val st = c.createStatement()
    try st.executeUpdate(
      "CREATE TABLE gl_commits (" +
        "dir VARCHAR(1024) NOT NULL, gen INT NOT NULL, " +
        "tmp VARCHAR(256) NOT NULL, complete INT NOT NULL, " +
        "PRIMARY KEY (dir, gen))")
    catch {
      // X0Y32: Derby "already exists"; 42S01/42P07: H2/Postgres
      case e: SQLException
          if Set("X0Y32", "42S01", "42P07")(e.getSQLState) ||
            Option(e.getMessage).exists(_.toLowerCase
              .contains("already exists")) => ()
    } finally st.close()
  }

  private def claim(c: Connection, dir: String, n: Int,
      tmpName: String): Boolean = {
    val ps = c.prepareStatement(
      "INSERT INTO gl_commits (dir, gen, tmp, complete) VALUES (?, ?, ?, 0)")
    try { ps.setString(1, dir); ps.setInt(2, n); ps.setString(3, tmpName)
      ps.executeUpdate(); true }
    catch { case e: SQLException if isDup(e) => false }
    finally ps.close()
  }

  private def recordedTmp(c: Connection, dir: String, n: Int)
      : Option[(String, Boolean)] = {
    val ps = c.prepareStatement(
      "SELECT tmp, complete FROM gl_commits WHERE dir = ? AND gen = ?")
    try { ps.setString(1, dir); ps.setInt(2, n)
      val rs = ps.executeQuery()
      try if (rs.next()) Some((rs.getString(1), rs.getInt(2) == 1))
      else None
      finally rs.close()
    } finally ps.close()
  }

  private def seal(c: Connection, dir: String, n: Int): Unit = {
    val ps = c.prepareStatement(
      "UPDATE gl_commits SET complete = 1 WHERE dir = ? AND gen = ?")
    try { ps.setString(1, dir); ps.setInt(2, n); ps.executeUpdate() }
    finally ps.close()
  }

  private def rollback(c: Connection, dir: String, n: Int,
      tmpName: String): Unit = {
    val ps = c.prepareStatement(
      "DELETE FROM gl_commits WHERE dir = ? AND gen = ? AND tmp = ? " +
        "AND complete = 0")
    try { ps.setString(1, dir); ps.setInt(2, n); ps.setString(3, tmpName)
      ps.executeUpdate() }
    finally ps.close()
  }

  private def lostRace(p: Path): Nothing =
    throw new IllegalArgumentException(
      s"graftlines: generation manifest $p already exists — concurrent " +
        "committers race on the generation number (arbitrated by the " +
        "commit coordinator); retry at the next generation")

  /** Bytes of `src` republished under `dst` with object-store-PUT
    * visibility: staged to a recoverer-unique name first, then one
    * rename — `dst` appears complete or not at all, and `src` is NOT
    * consumed (racing recoverers each stage their own copy of the
    * same claim-recorded bytes, so whoever lands last lands the same
    * content). A false rename means someone else already published —
    * success, by identical bytes. */
  private def copyPublish(fs: FileSystem, src: Path, dst: Path): Unit = {
    val staged = new Path(dst.getParent,
      dst.getName + "." + java.util.UUID.randomUUID().toString + ".tmp")
    val in = fs.open(src)
    try {
      val out = fs.create(staged, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      finally out.close()
    } finally in.close()
    try { if (!fs.rename(staged, dst)) require(fs.exists(dst)) }
    finally { try fs.delete(staged, false) catch { case _: Exception => () } }
  }

  /** Publish `tmp` as generation manifest `p`, arbitrated through the
    * claims table. Throws the loud "concurrent committers" error on a
    * lost race (after recovering a crashed winner's publish if there
    * is one to recover). */
  def publish(fs: FileSystem, dir: String, n: Int, tmp: Path,
      p: Path): Unit = {
    val c = connect()
    try {
      c.setAutoCommit(true)
      ensureTable(c)
      if (claim(c, dir, n, tmp.getName)) {
        // we own generation n exclusively: even a copy-implemented
        // rename cannot lose to anyone. If the rename fails but the
        // destination EXISTS while we still hold the claim, a racing
        // conflicter recovered OUR claim (it publishes the tmp bytes
        // the claim records — our bytes): that is success, and
        // reporting a loss instead would make the caller retry an
        // append that already landed (double commit). An out-of-band
        // committer bypassing the arbiter is the one other writer of
        // p; mixing arbitrated and fs-mode committers on one table is
        // undefined by contract.
        val ok =
          try fs.rename(tmp, p)
          catch {
            case t: Throwable =>
              if (fs.exists(p)) { seal(c, dir, n); true }
              else { rollback(c, dir, n, tmp.getName); throw t }
          }
        if (!ok) {
          if (fs.exists(p)) seal(c, dir, n)
          else {
            // transient publish failure: release the claim so the
            // generation stays cleanly retryable, then fail loudly
            rollback(c, dir, n, tmp.getName)
            throw new java.io.IOException(
              s"graftlines: failed publishing generation manifest $p")
          }
        } else seal(c, dir, n)
      } else {
        // lost the claim: recover a crashed winner first, then fail
        // loudly — our own commit content must retry at the next gen
        recordedTmp(c, dir, n) match {
          case Some((_, true)) => lostRace(p)
          case Some((winnerTmp, false)) =>
            if (!fs.exists(p)) {
              val src = new Path(p.getParent, winnerTmp)
              // the copy can fail mid-flight if the (merely slow, not
              // crashed) winner renames the tmp away under us — then
              // p exists and recovery is moot, not an error
              try { if (fs.exists(src)) copyPublish(fs, src, p) }
              catch { case t: Throwable => if (!fs.exists(p)) throw t }
              require(fs.exists(p),
                s"graftlines: generation $n of $dir is claimed but its " +
                  s"recorded tmp manifest $winnerTmp is gone — " +
                  "unrecoverable claim; clear the gl_commits row after " +
                  "confirming no committer is alive")
            }
            // seal opportunistically (the winner may have crashed
            // between publish and seal); best-effort tmp sweep
            seal(c, dir, n)
            try { val src = new Path(p.getParent, winnerTmp)
              if (fs.exists(src)) fs.delete(src, false)
            } catch { case _: Exception => () }
            lostRace(p)
          case None =>
            // claim row vanished between our INSERT failure and the
            // read: the winner rolled back — genuinely retryable
            lostRace(p)
        }
      }
    } finally c.close()
  }
}

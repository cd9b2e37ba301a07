package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `graftlines` — a complete DataSource V2 connector (SURVEY §2A/A1
  * growth surface: the engine's own pluggable source, not just consumers
  * of built-in formats).
  *
  * The format itself is deliberately trivial — a directory of UTF-8
  * text files, each starting with a `name:type` header line, rows
  * tab-separated with C-style escapes and `\N` for NULL — because the
  * point is the CONNECTOR contract, the part a user switching engines
  * actually touches:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): comparison /
  *    null / IN / boolean-combinator predicates on atomic columns are
  *    accepted and evaluated EXACTLY inside the reader (Spark removes
  *    them from the post-scan Filter, so the contract is exactness, not
  *    best-effort); anything else (LIKE family, date/timestamp
  *    literals, NaN literals) is declined and stays a residual Spark
  *    filter — partial pushdown done honestly.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader converts only required ∪ filter-referenced fields; pruned
  *    columns are never materialized.
  *  - **Distributed read**: block-splittable — files larger than
  *    `spark.sql.files.maxPartitionBytes` fan out as one
  *    [[InputPartition]] per byte range (readers scan to the next
  *    newline, the classic text-split rule), so scan parallelism is
  *    bounded by data volume, never by file count; each task opens its
  *    file straight against the Hadoop FileSystem API (conf travels
  *    via the standard [[SerializableConfiguration]]).
  *  - **Distributed write** ([[BatchWrite]]): per-task writers stream
  *    to task-unique STAGING names and the job commit renames them to
  *    their final `.gl` names in one driver-side loop (the staged-
  *    rename protocol — see [[GlWrite]]), so readers never observe a
  *    half-written job; `mode("overwrite")` plans
  *    OverwriteByExpression(true) which this builder satisfies via
  *    [[SupportsTruncate]], with the old generation deleted at commit
  *    time. Job abort deletes only staging files.
  *
  *  - **Columnar read** ([[PartitionReaderFactory.supportColumnarReads]]):
  *    ordinary scans emit `ColumnarBatch`es of reusable on-heap column
  *    vectors — downstream operators consume vectors inside
  *    whole-stage codegen instead of paying a virtual call per row.
  *    Parsing itself stays line-wise (inherent to a text format).
  *  - **File skipping**: writers accumulate per-file column stats into
  *    the `_graft_stats` manifest; `planInputPartitions` prunes files
  *    whose min/max prove no row can match the pushed filters.
  *
  * Remaining honest limit (documented at [[GlWrite]]): the commit's
  * rename loop is atomic per file, not across files, and two jobs
  * racing one directory still need a catalog on top.
  */
class GraftLines extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlines"

  /** Writes pass the DataFrame schema straight in (no inference on an
    * output dir that may not exist yet). */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLines.readDirSchema(GraftLines.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // a directory carrying the catalog's `_graft_schema` IS a
    // catalog-managed table, whatever access path reached it: its
    // authoritative schema vouches for ALTER-appended columns, so the
    // missing-column-reads-NULL rule applies exactly as it does
    // through the catalog (before this, a path read of an evolved
    // table dir errored on pre-ALTER files — or silently dropped the
    // new column, depending on which file's header inference happened
    // to pick). The catalog schema only vouches for columns it
    // CONTAINS: a user-supplied external schema with a column in
    // neither any file nor `_graft_schema` (a typo) must keep the
    // loud error, not read uniform NULL. Raw directories keep the
    // loud error unless the option opts in.
    val path = properties.get("path")
    val vouched = "true".equalsIgnoreCase(
      properties.get(GraftLines.NullFillOption)) ||
      GraftLines.catalogSchemaOf(path).exists(cat =>
        schema.fieldNames.forall(cat.fieldNames.contains))
    new GlTable(path, schema, nullFillMissing = vouched)
  }
}

object GraftLines {
  val Ext = ".gl"
  /** Read option: `true` gives a path-based read the catalog rule for
    * schema-evolved directories — a requested column missing from a
    * file's own header reads NULL instead of erroring. */
  val NullFillOption = "graft.nullFillMissing"
  /** Synthetic metadata column every reader can produce: the path of
    * the data file holding the row (`SELECT _file FROM t`) — the
    * lineage/debugging column real formats expose, and the group id
    * row-level operations ask for via requiredMetadataAttributes. */
  val FileCol = "_file"
  /** Per-directory stats manifest (no `.gl` suffix — must never be
    * listed as data). One line per (file, stats-eligible column):
    * `baseName \t rows \t col \t nulls \t min \t max \t ok` with
    * min/max in the cell text encoding (`\N` when the column is
    * all-NULL in that file) and a trailing sentinel field. The
    * sentinel is per-line integrity: a line truncated mid-write would
    * otherwise still parse — a numeric max `123456` cut to `12` is
    * valid text with a silently wrong value, and a wrong skip is row
    * loss, not a perf bug. Truncation can only hit the line's tail, so
    * "last field == sentinel" rejects exactly the damaged lines while
    * intact ones keep pruning. String columns ride the same line shape
    * with the literal `bloomv1` in the min slot and a fixed-width hex
    * Bloom filter in the max slot (see [[GlBloom]]) — equality
    * skipping for the type family min/max pruning declines. The
    * manifest is the file-skipping index — the role parquet footers /
    * Iceberg manifests play: the driver reads ONE small file at plan
    * time instead of opening N data files. */
  val StatsName = "_graft_stats"
  val StatsSentinel = "ok"
  /** Per-file LENGTH cross-check line: `baseName \t rows \t #len \t 0
    * \t byteLen \t - \t ok` (the marker rides the column slot, so a
    * reader that predates it sees an unknown column name and skips the
    * line — same forward/backward posture as the Bloom lines). Stats
    * maintenance is deliberately best-effort (mergeStats swallows
    * failures), which is safe for PRUNING (a stale line only ever
    * widens the kept range after a same-name COW rewrite shrinks a
    * file) but NOT for the COUNT(*)-from-manifest shortcut, where a
    * stale row count would be served as an exact result. The recorded
    * byte length is the staleness detector: any consumer that treats
    * `rows` as EXACT must require `#len == FileStatus.getLen` and
    * degrade to a real scan otherwise. Why the length check is a real
    * staleness PROOF for every current same-name rewrite (not mere
    * defense-in-depth): the only paths that republish under an
    * existing name are (a) the fast-path COW DELETE
    * ([[rewriteWithoutMatches]], nameOverride = the old base name),
    * which is removal-only — surviving lines are byte-identical, so a
    * changed row count ALWAYS changes the length (every dropped row
    * was >= 1 byte + newline); and (b) streaming epoch replacement on
    * a plain directory (`part-<pid>-e<E>-<task>` names), where a
    * retried epoch deterministically rewrites the SAME rows, so an
    * unchanged length accompanies an unchanged count. A future rewrite
    * path that both changes the row set AND rewrites surviving values
    * under one name would break the proof (counts could change at a
    * coincidentally-preserved length) — such a path must mint fresh
    * names or record a content token (mtime / header checksum) beside
    * the length. */
  val StatsLenMarker = "#len"

  /** Opt-in TIME TRAVEL, as a table feature (the Delta/Iceberg
    * posture: versioning is a property of the TABLE, not a reader
    * flag). A directory is versioned iff the `_graft_versioned`
    * marker exists (written by the catalog for
    * `TBLPROPERTIES ('versioned'='true')`) or any generation manifest
    * `_graft_gen.<N>` does. On a versioned table every commit —
    * append, overwrite, or row-level COW rewrite — publishes a NEW
    * generation manifest listing the data files of that version and
    * deletes nothing; data files carry a `-g<N>` suffix so a name can
    * never be reused across generations (reuse would rewrite history
    * in place). Readers resolve the requested generation (default:
    * latest) and plan ONLY its files, so `VERSION AS OF n` is one
    * extra metadata-file read at plan time — the data path, pruning,
    * block splitting, and runtime filtering are identical. Non-
    * versioned directories keep the original semantics bit-for-bit
    * (physical truncation, directory-listing planning). Honest
    * limits: generations accumulate until [[expireVersions]] runs
    * (retention is a policy, so it is an explicit call, not a
    * side effect), and concurrent committers race on the next
    * generation number exactly as they race on the rename loop — the
    * catalog layer remains the multi-writer answer. */
  val VersionMarker = "_graft_versioned"
  val GenPrefix = "_graft_gen."

  /** Identity partitioning as a table property (the Hive/Iceberg
    * `PARTITIONED BY (col)` posture): the `_graft_partcol` marker
    * holds the partition column's name. Partitioned writes route each
    * task's rows into ONE FILE PER PARTITION VALUE (the engine first
    * clusters rows by the column — see [[GlWrite]]), so every data
    * file provably holds a single partition value, recoverable from
    * its stats line (min == max). That single-value-per-file property
    * is what lets the scan report [[org.apache.spark.sql.connector
    * .read.partitioning.KeyGroupedPartitioning]] and two co-partitioned
    * tables join with ZERO exchange — the storage-partitioned join.
    * Restricted to stats-eligible (ordered, non-string) columns: the
    * stats manifest is the value-recovery mechanism, and string
    * min/max ordering is exactly what the connector refuses to trust. */
  val PartColMarker = "_graft_partcol"

  /** Hash-BUCKET partitioning (the scalable sibling of identity
    * partitioning: identity needs few distinct values, buckets cover
    * arbitrary keys — orders⋈customer on custkey with zero exchange).
    * The `_graft_buckets` marker holds `col \t numBuckets`; the bucket
    * function is OURS — `((v % n) + n) % n` on the column's long/int
    * value — published to Spark through [[GraftCatalog]]'s
    * FunctionCatalog so both the write distribution and the reported
    * read partitioning resolve to the same canonical function. Bucket
    * ids ride FILE NAMES (`…-b<id>.gl`) — integers need no escaping
    * and survive every commit path. */
  val BucketMarker = "_graft_buckets"

  private[sources] def bucketSpec(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Option[(String, Int)] = {
    val p = new Path(new Path(dir), BucketMarker)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val br = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
      try Option(br.readLine()).map(_.trim.split('\t')).collect {
        case Array(c, n) if n.toIntOption.exists(_ >= 1) => (c, n.toInt)
      }
      finally br.close()
    }
  }

  private[sources] def writeBucketSpec(dir: String, col: String, n: Int,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new Path(new Path(dir), BucketMarker)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(new Path(dir))
    val w = new OutputStreamWriter(fs.create(p, true), UTF_8)
    try { w.write(s"$col\t$n"); w.write('\n') } finally w.close()
  }

  /** The one bucket function, shared by writer routing and the
    * FunctionCatalog-published form: non-negative value mod n. */
  private[sources] def bucketOf(v: Long, n: Int): Int =
    (((v % n) + n) % n).toInt

  // the -b<id> tag may be followed by generation suffixes: versioned
  // commits rename `…-b3.gl` → `…-b3-g7.gl` (and a versioned COW
  // rewrite can stack another), so the id must parse through ANY
  // trailing `-g<N>` run or bucketed+versioned tables would silently
  // lose KeyGroupedPartitioning on every commit
  private[sources] val BucketNamePattern =
    java.util.regex.Pattern.compile(".*-b(\\d+)(?:-g\\d+)*\\.gl$")

  /** Job-unique file-name tag for BATCH writes. Task ids are only
    * unique per SparkContext (taskAttemptId restarts at 0 in a fresh
    * application), so `part-<pid>-<tid>.gl` from two applications CAN
    * collide — and the append commit's crashed-attempt replacement
    * (delete-then-rename) would then silently swallow the earlier
    * job's committed file. A driver-generated tag riding every final
    * name restores global uniqueness; it also makes compact scratch
    * names collision-free across applications. The leading 't' keeps
    * the segment disjoint from the streaming `-e<epoch>-` tag (whose
    * stale-epoch clear substring-matches names) and from `-b`/`-g`/
    * `-p` suffix parsing. Streaming writers deliberately do NOT carry
    * it: their epoch-keyed names are the replace-per-epoch idempotence
    * mechanism, where cross-application collision is the CONTRACT. */
  private[sources] def newJobTag(): String =
    "t" + java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()
        | (1L << 60)).take(8)

  private[sources] def bucketIdOf(baseName: String): Option[Int] = {
    val m = BucketNamePattern.matcher(baseName)
    if (m.matches()) m.group(1).toIntOption else None
  }

  private[sources] def partitionCol(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Option[String] = {
    val p = new Path(new Path(dir), PartColMarker)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val br = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
      try Option(br.readLine()).map(_.trim).filter(_.nonEmpty)
      finally br.close()
    }
  }

  private[sources] def writePartitionCol(dir: String, col: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new Path(new Path(dir), PartColMarker)
    val fs = p.getFileSystem(conf)
    val existing = partitionCol(dir, conf)
    require(existing.forall(_ == col),
      s"graftlines: $dir is already partitioned by " +
        s"'${existing.getOrElse("")}' — cannot repartition to '$col'")
    if (existing.isEmpty) {
      val w = new OutputStreamWriter(fs.create(p, true), UTF_8)
      try { w.write(col); w.write('\n') } finally w.close()
    }
  }

  private[sources] def isVersioned(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.exists(new Path(p, VersionMarker)) || genVersions(dir, conf).nonEmpty
  }

  /** Latest committed generation of a versioned table — the number
    * `versionAsOf` would address to pin TODAY'S snapshot. Operators
    * that mutate a table but must keep serving pre-mutation frames
    * afterwards (DedupIndex.ingest's audit report) read this before
    * writing: a frame over the live table re-lists files at execution
    * time, so a post-mutation evaluation would silently include the
    * mutation. 0 when the table has no committed generation yet. */
  def currentVersion(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Int =
    genVersions(dir, conf).lastOption.getOrElse(0)

  /** Committed generation numbers, ascending. */
  private[sources] def genVersions(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[Int] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(GenPrefix))
      .flatMap(st => st.getPath.getName.stripPrefix(GenPrefix).toIntOption)
      .sorted
  }

  private[sources] def genPath(dir: String, n: Int): Path =
    new Path(new Path(dir), s"$GenPrefix$n")

  /** Data-file base names of generation `n` (comment lines — the
    * streaming sink's `#epoch:` tag — are manifest metadata, never
    * file names). */
  private[sources] def readGen(dir: String, n: Int,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val p = genPath(dir, n)
    val fs = p.getFileSystem(conf)
    val br = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
    try Iterator.continually(br.readLine()).takeWhile(_ != null)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toList
    finally br.close()
  }

  /** (epoch, queryTag) pairs already committed into a versioned
    * directory's generation manifests (the streaming sink's idempotence
    * ledger): generation manifests published by [[GlStreamingWrite]]
    * carry a `#epoch:<E>:<query>` first line, so "was this epoch
    * committed?" is answered by the SAME atomic rename that published
    * the data — there is no separate log whose lag could double-commit
    * a replayed micro-batch. The QUERY tag is part of the key because
    * epoch numbers are per query: a replacement job with a fresh
    * checkpoint restarts at epoch 0, and a ledger keyed on the bare
    * number would silently swallow its first batches as "replays" of
    * the previous query's epochs. Manifests written before the query
    * tag existed parse with tag "" and are matched as wildcards (any
    * query), preserving replay protection across an upgrade at the
    * cost of the legacy generations' cross-query ambiguity. Batch
    * commits carry no tag and are never replayed. */
  private[sources] def committedEpochs(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Set[(Long, String)] =
    genVersions(dir, conf).flatMap(epochOfGen(dir, _, conf)).toSet

  /** Filesystem- and tag-safe form of a streaming query id: the id
    * rides generation-manifest first lines and plain-directory file
    * names, so it is reduced to letters/digits/dashes (a UUID passes
    * through unchanged); empty ids — direct harness use — normalize
    * to a fixed token so same-caller replays still match. */
  private[sources] def queryTag(id: String): String = {
    val t = Option(id).getOrElse("")
      .filter(c => c.isLetterOrDigit || c == '-')
    if (t.isEmpty) "adhoc" else t
  }

  /** The `#epoch:<E>[:<query>]` tag of one generation manifest, if it
    * carries one — ("" query = pre-tag legacy manifest). A manifest's
    * first line is immutable once the publish rename lands, so a
    * generation's answer here never changes — which is what lets
    * [[GlStreamingWrite]] cache it per generation instead of
    * re-reading every manifest on every epoch commit. */
  private[sources] def epochOfGen(dir: String, n: Int,
      conf: org.apache.hadoop.conf.Configuration): Option[(Long, String)] = {
    GlMetrics.epochTagReads.incrementAndGet()
    val p = genPath(dir, n)
    val fs = p.getFileSystem(conf)
    val br = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
    try Option(br.readLine()).filter(_.startsWith("#epoch:"))
      .flatMap { line =>
        val body = line.stripPrefix("#epoch:")
        val (e, q) = body.indexOf(':') match {
          case -1 => (body, "")
          case i => (body.substring(0, i), body.substring(i + 1))
        }
        e.toLongOption.map((_, q))
      }
    finally br.close()
  }

  /** Publish generation `n` via temp + rename (readers see a complete
    * manifest or none — same discipline as the stats manifest). Unlike
    * stats, a failed generation publish FAILS the commit: the
    * generation manifest is the source of truth for what a versioned
    * read returns, not an optimization.
    *
    * A destination that ALREADY exists fails the commit loudly: two
    * committers that both computed `n` as the next generation would
    * otherwise last-writer-win on filesystems whose rename clobbers
    * (Hadoop's local FS does; HDFS's rename-onto-existing fails and
    * is the true compare-and-swap) — and since each job's DATA file
    * names are job-unique, the manifest is the one place the race
    * surfaces.
    *
    * On stores WITHOUT an atomic no-clobber primitive (S3A/GCS
    * implement rename as exists-check + copy), set
    * `graft.lines.commit.coordinator=jdbc` to arbitrate the publish
    * through [[GlCommitCoordinator]] — the CAS moves to a shared
    * database's `(dir, gen)` primary key and the filesystem's rename
    * semantics stop mattering. With the default `fs` mode the
    * residual check-then-rename window on such stores remains the
    * documented honest limit: serialize writers through the catalog. */
  private[sources] def writeGen(dir: String, n: Int, baseNames: Seq[String],
      conf: org.apache.hadoop.conf.Configuration,
      epoch: Option[(Long, String)] = None): Unit = {
    val p = genPath(dir, n)
    val fs = p.getFileSystem(conf)
    require(!fs.exists(p),
      s"graftlines: generation manifest $p already exists — concurrent " +
        "committers race on the generation number; serialize writers " +
        "through the catalog")
    // resolve the committer's mode and cross-check the TABLE's pin
    // before any staging I/O: an fs-mode committer on an arbitrated
    // table must fail loudly here, not silently race the claims CAS
    // through the filesystem (the first arbitrated commit brands the
    // table; see GlCommitCoordinator.ArbiterMarker)
    val arbiter = GlCommitCoordinator.forConf(conf)
    GlCommitCoordinator.enforceTableMode(fs, dir, arbiter.isDefined)
    // writer-unique tmp name (the data-file staging discipline): a
    // shared tmp would let two racers truncate or steal each other's
    // in-flight manifest, corrupting the very CAS the exists checks add
    val tmp = new Path(p.getParent,
      p.getName + "." + java.util.UUID.randomUUID().toString + ".tmp")
    try {
      val w = new OutputStreamWriter(fs.create(tmp, true), UTF_8)
      try {
        epoch.foreach { case (e, q) =>
          w.write(s"#epoch:$e:$q"); w.write('\n') }
        baseNames.sorted.foreach { b => w.write(b); w.write('\n') }
      } finally w.close()
      // re-check at the last instant: the first check ran before the
      // tmp write, and a racer may have published while we streamed it
      require(!fs.exists(p),
        s"graftlines: generation manifest $p already exists — concurrent " +
          "committers race on the generation number; serialize writers " +
          "through the catalog")
      if (arbiter.isDefined) {
        // externally-arbitrated CAS (object-store mode): the claims
        // table serializes generation n; rename semantics no longer
        // carry the correctness load. Throws the same loud
        // "concurrent committers" error on a lost race.
        arbiter.get.publish(fs, dir, n, tmp, p)
      } else if (isLocalScheme(fs) && publishByLink(fs, tmp, p)) {
        // local filesystems: POSIX rename CLOBBERS an existing
        // destination, so check-then-rename has a real lost-commit
        // window (the 6-writer soak hit it). link(2) is the atomic
        // publish-or-fail primitive there: it creates the destination
        // complete (same inode as the fully-written tmp) and FAILS if
        // it already exists. publishByLink throws the loud
        // concurrent-committers error on that failure; false means
        // links are unsupported on this mount -> rename fallback below.
        // Post-publish work is BEST-EFFORT: the manifest is durable,
        // so failing the commit here would be a phantom failure a
        // retrying caller turns into duplicate rows
        try {
          def crc(q: Path) = new Path(q.getParent, "." + q.getName + ".crc")
          // carry the checksum sidecar to the destination (the
          // manifest is the source of truth — keep it verifiable)
          if (!fs.rename(crc(tmp), crc(p))) fs.delete(crc(tmp), false)
        } catch { case _: Exception => () }
        try fs.delete(tmp, false) catch { case _: Exception => () }
      } else {
        // HDFS: rename-onto-existing fails atomically in the NameNode,
        // so the rename itself is the compare-and-swap. That guarantee
        // is SCHEME-SPECIFIC: object-store connectors (S3A, GCS)
        // implement rename as a client-side exists-check + copy, which
        // reopens the same check-then-rename window the link(2) path
        // closes on local mounts. On such stores this branch is
        // best-effort only — concurrent committers there must be
        // serialized through the catalog (the exists() check above is
        // the loud first line of defense), or the table should live on
        // a filesystem with atomic no-clobber rename.
        require(fs.rename(tmp, p),
          s"graftlines: failed publishing generation manifest $p")
      }
    } catch {
      case d: GlCommitInDoubtException =>
        // the arbiter holds a claim recording THIS tmp as generation
        // n's bytes: it is the recovery source the next committer
        // publishes from — deleting it would wedge the generation
        // behind the non-retryable unrecoverable-claim error
        throw d
      case t: Throwable =>
        // the loser (or a crashed publish) must not leave its tmp as a
        // permanent dropping in the table directory
        try fs.delete(tmp, false) catch { case _: Throwable => () }
        throw t
    }
  }

  /** Non-throwing local-scheme probe: FileSystem.getScheme's base
    * implementation THROWS UnsupportedOperationException, so a
    * third-party FS that doesn't override it must take the portable
    * rename path, not break every commit. */
  private def isLocalScheme(fs: org.apache.hadoop.fs.FileSystem): Boolean =
    try "file" == fs.getUri.getScheme catch { case _: Exception => false }

  /** Atomic local-FS same-name replace: publish `staged` over `dst`
    * with POSIX rename, which replaces the destination in place — no
    * instant leaves the file absent (the delete-then-rename fallback
    * has exactly that crash window). Ordered around the checksummed
    * local FS's `.crc` sidecars so every intermediate state READS
    * correctly: the stale sidecar is dropped first (a data file with
    * no sidecar reads unverified; new-data-under-old-crc would fail
    * every read), then the one atomic data move, then the sidecar
    * restore — and after the move succeeds there is no falling back,
    * because the new data is already live. Returns false (caller uses
    * delete+rename) only when the move itself cannot run. */
  private[sources] def replaceByMove(fs: org.apache.hadoop.fs.FileSystem,
      staged: Path, dst: Path): Boolean = {
    def crc(q: Path) = new Path(q.getParent, "." + q.getName + ".crc")
    def nio(q: Path) =
      java.nio.file.Paths.get(fs.makeQualified(q).toUri.getPath)
    try {
      fs.delete(crc(dst), false)
      java.nio.file.Files.move(nio(staged), nio(dst),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Exception => return false }
    // best-effort sidecar restore: a failure here leaves dst readable
    // (unverified) and must not trigger the fallback — the survivors
    // are already published. A THROWING rename still cleans the staged
    // sidecar (otherwise it leaks as permanent '..x.staging.crc'
    // debris no sweep matches)
    try {
      if (!fs.rename(crc(staged), crc(dst))) fs.delete(crc(staged), false)
    } catch { case _: Exception =>
      try fs.delete(crc(staged), false) catch { case _: Exception => () }
    }
    true
  }

  /** Atomic local-FS publish: hard-link `tmp` to `p` — link(2) fails
    * if `p` exists, atomically, which POSIX rename does not. Returns
    * false ONLY when the mount does not support hard links (caller
    * falls back to rename and its documented window); throws the loud
    * concurrent-committers error when `p` already exists, and
    * rethrows any OTHER failure — falling back to the clobbering
    * rename on a transient error (EIO, ENOSPC) would silently
    * reintroduce the exact lost-commit window this primitive closes,
    * whereas a loud commit failure is safely retryable. */
  private def publishByLink(fs: org.apache.hadoop.fs.FileSystem,
      tmp: Path, p: Path): Boolean = {
    val src = java.nio.file.Paths.get(
      fs.makeQualified(tmp).toUri.getPath)
    val dst = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
    try { java.nio.file.Files.createLink(dst, src); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"graftlines: generation manifest $p already exists — " +
            "concurrent committers race on the generation number; " +
            "serialize writers through the catalog")
      case _: UnsupportedOperationException => false
      case e: java.nio.file.FileSystemException
          // ENOTSUP/EPERM are how linkless mounts (some FUSE/network
          // local mounts) surface; anything else is a real I/O error
          if Option(e.getReason).exists(r =>
            r.contains("not supported") || r.contains("not permitted")) =>
        false
    }
  }

  /** The planner's file source: generation-resolved on versioned
    * directories (requested or latest), raw directory listing
    * otherwise. A gen-listed file missing from disk is loss (a manual
    * delete or an over-eager retention sweep) — fail loudly, never
    * silently return a partial version. */
  private[sources] def resolveDataFileStatuses(dir: String,
      conf: org.apache.hadoop.conf.Configuration,
      versionAsOf: Option[Int]): Seq[(String, Long)] = {
    val gens = genVersions(dir, conf)
    if (gens.isEmpty) {
      require(versionAsOf.isEmpty,
        s"graftlines: VERSION AS OF ${versionAsOf.getOrElse(-1)} on " +
          s"$dir, which has no committed generations")
      listDataFileStatuses(dir, conf)
    } else {
      val target = versionAsOf.getOrElse(gens.max)
      require(gens.contains(target),
        s"graftlines: no generation $target under $dir " +
          s"(committed: ${gens.mkString(", ")})")
      val wanted = readGen(dir, target, conf).toSet
      val present = listDataFileStatuses(dir, conf)
        .filter { case (f, _) => wanted.contains(new Path(f).getName) }
      val missing = wanted -- present.map { case (f, _) =>
        new Path(f).getName }
      require(missing.isEmpty,
        s"graftlines: generation $target of $dir lists missing file(s) " +
          s"${missing.toSeq.sorted.mkString(", ")} — history was deleted " +
          "outside expireVersions")
      present
    }
  }

  /** `TIMESTAMP AS OF` resolution: the newest generation whose
    * manifest was PUBLISHED at or before the target instant — commit
    * time is the generation manifest's filesystem mtime, stamped by
    * the atomic rename that made the version visible (the same
    * convention Delta reads from its log entries' timestamps). Honest
    * limits, stated: mtimes come from the storage system's clock, and
    * copying a table byte-for-byte refreshes them — version numbers
    * are the durable coordinate, timestamps the human-friendly one
    * (which is why the CONTRACT queries pin versions and this path is
    * spec-gated). A target before the first commit fails loudly. */
  private[sources] def genAtTimestamp(dir: String, targetMs: Long,
      conf: org.apache.hadoop.conf.Configuration): Int = {
    val fs = new Path(dir).getFileSystem(conf)
    val stamped = genVersions(dir, conf)
      .map(n => (n, fs.getFileStatus(genPath(dir, n)).getModificationTime))
    require(stamped.nonEmpty,
      s"graftlines: TIMESTAMP AS OF on $dir, which has no committed " +
        "generations")
    val at = stamped.filter(_._2 <= targetMs)
    require(at.nonEmpty,
      s"graftlines: no generation of $dir existed at epoch-ms $targetMs " +
        s"(earliest commit: ${stamped.head._2})")
    at.map(_._1).max
  }

  private[sources] def parseTsOption(v: String): Long =
    v.toLongOption.getOrElse {
      try java.time.Instant.parse(v).toEpochMilli
      catch { case _: java.time.format.DateTimeParseException =>
        java.sql.Timestamp.valueOf(v).getTime
      }
    }

  /** Retention sweep for versioned tables: keep the newest `keepLast`
    * generations, delete older generation manifests and every data
    * file no RETAINED generation references, and drop the dead files'
    * stats lines. All O(files) driver metadata — data never moves.
    *
    * `gcOrphans` (default OFF) additionally reclaims files NO
    * generation ever referenced — the leftovers a failed commit leaves
    * after its data renames but before its manifest publish — so
    * `expireVersions(dir, keepLast >= generations, gcOrphans = true)`
    * doubles as an orphan-only GC. Opt-in because it changes the
    * safety contract visibly at the call site: without it a call with
    * `keepLast >= generations` is a guaranteed no-op, with it an
    * IN-FLIGHT commit's renamed-but-not-yet-manifested files look
    * exactly like orphans and would be swept. Either way the sweep
    * must not run concurrently with a committer (maintenance is a
    * table-quiet operation, like vacuum everywhere) — the flag just
    * keeps the no-expiry call harmless for callers who treat it so.
    * Returns (expired generations, deleted data files). */
  def expireVersions(dir: String, keepLast: Int,
      conf: org.apache.hadoop.conf.Configuration,
      gcOrphans: Boolean = false): (Seq[Int], Seq[String]) = {
    require(keepLast >= 1, "expireVersions must keep at least one generation")
    val fs = new Path(dir).getFileSystem(conf)
    val gens = genVersions(dir, conf)
    // a dir with no generations is NOT a versioned table: treating its
    // directory-listed files as "unreferenced" would delete live data
    if (gens.isEmpty) return (Nil, Nil)
    val (drop, keep) = gens.splitAt(math.max(0, gens.length - keepLast))
    val live = keep.flatMap(readGen(dir, _, conf)).toSet
    val listed = listDataFiles(dir, conf)
    val dead =
      if (gcOrphans) listed.filter(f => !live.contains(new Path(f).getName))
      else {
        // only files an EXPIRING generation referenced: never-manifested
        // files stay untouched unless the caller opted into orphan GC
        val droppedRefs = drop.flatMap(readGen(dir, _, conf)).toSet
        listed.filter { f =>
          val n = new Path(f).getName
          !live.contains(n) && droppedRefs.contains(n)
        }
      }
    if (drop.isEmpty && dead.isEmpty) return (Nil, Nil)
    // delete results are CHECKED before the manifests go: a silently
    // failed delete (false + file still present) whose referencing
    // manifests were then dropped becomes unreclaimable for a
    // gcOrphans=false caller (no droppedRefs set will ever list it
    // again) while the return value reports it deleted. Failing here
    // keeps every manifest intact, so a rerun recomputes the same
    // dead set and retries; files that DID delete are simply no
    // longer listed.
    val failedDead = dead.filter { f =>
      val p = new Path(f)
      !fs.delete(p, false) && fs.exists(p)
    }
    require(failedDead.isEmpty,
      s"graftlines: expireVersions could not delete ${failedDead.size} " +
        s"file(s) (${failedDead.take(3).mkString(", ")}…) — manifests " +
        "kept; rerun after resolving")
    drop.foreach(n => fs.delete(genPath(dir, n), false))
    // arbitrated tables: retire the dropped generations' claim rows on
    // the same schedule as their manifests. The WHOLE step is
    // best-effort — including coordinator resolution: a misconfigured
    // conf (jdbc mode, missing URL) must not turn an expiry that
    // already deleted files into a hard failure that also skips the
    // stats merge below. The rows are audit metadata by now (each
    // dropped generation's manifest was just verified on disk).
    if (drop.nonEmpty)
      try {
        val arb = GlCommitCoordinator.forConf(conf)
        arb.foreach(_.pruneClaims(fs, dir, drop))
        // expiry is read-side housekeeping, so an fs-mode run on an
        // arbitrated table is not the commit hazard the marker blocks —
        // but its claim rows were NOT pruned and would leak silently
        if (arb.isEmpty && fs.exists(
            new Path(dir, GlCommitCoordinator.ArbiterMarker)))
          System.err.println(s"[graftlines] expireVersions: $dir is " +
            "pinned to an arbitrated commit coordinator but this " +
            "expiry ran in fs mode — the dropped generations' claim " +
            "rows were NOT pruned and will leak until an arbitrated " +
            "expiry runs")
      } catch { case e: Exception =>
        // swallowed, but never silently: a typo'd URL or revoked
        // DELETE grant would otherwise leak one claim row per
        // generation forever with nothing anywhere to reveal it
        System.err.println(s"[graftlines] expireVersions: claim-row " +
          s"prune for $dir gens<=${drop.max} failed (expiry itself " +
          s"succeeded): ${e.getMessage}")
      }
    mergeStats(dir, conf,
      dropNames = dead.map(new Path(_).getName).toSet, newLines = Nil)
    (drop, dead)
  }

  /** Small-file compaction (the OPTIMIZE lifecycle op — completes the
    * table-management family: snapshot = versioned reads, clone =
    * shared storage, vacuum/expire = reclaim, COMPACT = keep scan task
    * counts proportional to bytes, not write history). Rewrites the
    * CURRENT file set into at most `maxFiles` files via a distributed
    * Spark job (read → coalesce → write to a scratch dir — data moves
    * executor-to-executor, never through the driver), then swaps the
    * result in:
    *
    *  - **Versioned table**: the swap is a NEW generation manifest
    *    listing only the compacted files — one atomic rename, history
    *    intact (every older generation still resolves its own files;
    *    `expireVersions` reclaims the fragmented ones later). Restart
    *    safety is the manifest discipline: a crash before the publish
    *    leaves the table exactly as it was.
    *  - **Plain directory**: old files delete + compacted files move
    *    in (`compact-<k>-…` names cannot collide with task names);
    *    the cross-file window is the same documented non-atomicity as
    *    every logless swap here — the catalog/versioning layer is the
    *    transactional answer.
    *
    * Per-file stats ride along: the scratch write's manifest lines are
    * re-keyed to the final names, so pruning keeps working on the
    * compacted layout. Returns (files before, files after); no-op when
    * already within budget. */
  def compact(dir: String, maxFiles: Int,
      spark: SparkSession): (Int, Int) = {
    require(maxFiles >= 1, "compact must keep at least one file")
    val conf = spark.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    // the generation the rewrite is OF — captured before the Spark
    // job so a commit landing mid-compact collides LOUDLY at publish
    // time (see below) instead of being silently omitted from the
    // compacted generation and later reclaimed as expired
    val snapshotGen = genVersions(dir, conf).lastOption.getOrElse(0)
    val before = resolveDataFileStatuses(dir, conf, None).map(_._1)
    if (before.size <= maxFiles) return (before.size, before.size)
    // read with the UNION of the LIVE files' own header schemas (plus
    // null-fill): a schema-evolved table holds files with different
    // column sets, and inferring from whichever file lists first would
    // either silently DROP an evolved column from the rewrite (old
    // narrow header first — permanent data loss once the originals
    // expire) or fail the read (wide header first, narrow file missing
    // a column without null-fill). First-appearance order keeps the
    // uniform-schema case byte-identical to the old inference.
    val unionSchema = before.foldLeft(new StructType()) { (acc, f) =>
      headerSchemaOfFile(f, conf).fields.foldLeft(acc) { (a, fld) =>
        if (a.fieldNames.contains(fld.name)) a else a.add(fld)
      }
    }
    val scratch = new Path(dir, ".compact-scratch").toString
    fs.delete(new Path(scratch), true)
    spark.read.schema(unionSchema)
      .option(NullFillOption, "true")
      .format("graftlines").load(dir)
      .coalesce(maxFiles)
      .write.format("graftlines").mode("overwrite").save(scratch)
    val moved = listDataFiles(scratch, conf).zipWithIndex.map {
      case (f, i) =>
        val src = new Path(f)
        (src.getName, s"compact-$i-${src.getName}")
    }
    // scratch stats lines re-keyed to the final names (raw text remap
    // — the payload after the first tab field is name-independent)
    val statLines: Seq[String] = {
      val sp = statsPath(scratch)
      if (!fs.exists(sp)) Nil
      else {
        val nameMap = moved.toMap
        val br = new BufferedReader(new InputStreamReader(fs.open(sp), UTF_8))
        try Iterator.continually(br.readLine()).takeWhile(_ != null)
          .flatMap { l =>
            val cut = l.indexOf('\t')
            if (cut < 0) None
            else nameMap.get(l.substring(0, cut))
              .map(nb => nb + l.substring(cut))
          }.toList
        finally br.close()
      }
    }
    moved.foreach { case (base, nb) =>
      val dst = new Path(dirPath, nb)
      // scratch names carry a fresh job tag so this cannot trip in
      // practice; the guard keeps a collision from ever silently
      // REPLACING bytes a historical generation still references
      // (local-FS rename overwrites; HDFS rename would just fail)
      require(!fs.exists(dst),
        s"graftlines: compact target $nb already exists — refusing " +
          "to overwrite a published file")
      require(fs.rename(new Path(scratch, base), dst),
        s"graftlines: compact failed moving $base -> $nb")
    }
    if (isVersioned(dir, conf)) {
      // publish at snapshotGen + 1, NOT a freshly-listed last + 1: if
      // a commit landed while the rewrite job ran, that commit took
      // this number and the writeGen CAS fails loudly — aborting the
      // compact (correct: its input snapshot is stale) instead of
      // publishing a generation that silently omits the new commit's
      // files. The moved-in compacted files then remain as
      // unmanifested orphans, the same debris class as a lost
      // append's, reclaimable via expireVersions(gcOrphans = true).
      writeGen(dir, snapshotGen + 1, moved.map(_._2), conf)
      if (statLines.nonEmpty)
        mergeStats(dir, conf, dropNames = Set.empty, newLines = statLines)
    } else {
      // a delete reporting false (permissions, locks) with the file
      // still on disk would leave the old rows alive NEXT TO their
      // compacted copies — silent permanent duplication, with the
      // file's stats line already dropped so nothing ever flags it
      val failed = before.filter { f =>
        val p = new Path(f)
        !fs.delete(p, false) && fs.exists(p)
      }
      require(failed.isEmpty,
        s"graftlines: compact could not delete ${failed.size} " +
          s"pre-compact file(s) (${failed.take(3).mkString(", ")}…) — " +
          "aborting before the stats merge; rows would otherwise be " +
          "duplicated next to their compacted copies")
      mergeStats(dir, conf,
        dropNames = before.map(new Path(_).getName).toSet,
        newLines = statLines, replaceAll = true)
    }
    fs.delete(new Path(scratch), true)
    (before.size, moved.size)
  }

  /** Stats refresh / back-fill (the ANALYZE TABLE lifecycle op).
    * Recomputes the stats-manifest lines — including the `#len`
    * length cross-check — for every CURRENT data file whose manifest
    * entry is missing or not verifiably fresh (`#len` absent or not
    * equal to the live length). Manifests written before the `#len`
    * line existed permanently lose the exact-numRows planner hint and
    * the COUNT(*)-from-manifest shortcut (results stay correct via the
    * scan fallback — a silent performance degradation, not a
    * correctness one); this op restores the fast path WITHOUT
    * rewriting any data file.
    *
    * Honesty note: the back-fill RE-COUNTS each stale file by reading
    * it (a distributed Spark job, one task per file — never through
    * the driver). Simply stamping the live length next to the OLD
    * recorded row count would bless a possibly-stale count as exact —
    * the precise failure `#len` exists to prevent.
    *
    * Fresh files are untouched. Returns (files examined, files
    * refreshed). */
  def refreshStats(dir: String, spark: SparkSession): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = resolveDataFileStatuses(dir, conf, None)
    if (files.isEmpty) return (0, 0)
    val schema = readHeaderSchema(dir)
    val stats = readStats(dir, conf, schema)
    val stale = files.filter { case (f, len) =>
      !stats.get(new Path(f).getName).exists(_.fileLen.contains(len))
    }
    if (stale.isEmpty) return (files.size, 0)
    val sconf = new SerializableConfiguration(conf)
    // Each file is recounted against ITS OWN header schema — exactly
    // what GlWriter recorded when the file landed, so the refreshed
    // lines are writer-parity by construction. Using one table-level
    // schema here would be wrong on a schema-evolved table: whichever
    // file happened to sort first would dictate the column set, and a
    // column it lacks (ALTER TABLE ADD after it was written) would
    // silently lose its recorded stats on every OTHER file — a
    // file-order-dependent pruning regression. Per-file schemas also
    // make nullFillMissing moot: nothing in a file's own header can be
    // missing from that file.
    val lines = spark.sparkContext
      .parallelize(stale, math.min(stale.size, 64))
      .flatMap { case (f, len) =>
        val base = new Path(f).getName
        val fileSchema = headerSchemaOfFile(f, sconf.value)
        val acc = new GlStatsAcc(fileSchema)
        val r = new GlReader(f, fileSchema, Array.empty, None, sconf.value)
        try { while (r.next()) acc.add(r.get()) } finally r.close()
        acc.lines(len).map(l => s"$base\t$l")
      }.collect().toSeq
    mergeStats(dir, conf,
      dropNames = stale.map { case (f, _) => new Path(f).getName }.toSet,
      newLines = lines)
    (files.size, stale.size)
  }

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graftlines requires a path")
    p
  }

  /** Schema from the header of the first data file (one driver-side
    * directory listing — the same cost every path-based source pays). */
  /** One FILE's own header schema — executor-safe (takes the Hadoop
    * conf explicitly instead of reaching for SparkSession.active).
    * The authority for what THAT file stores; see [[refreshStats]]. */
  private[sources] def headerSchemaOfFile(file: String,
      conf: org.apache.hadoop.conf.Configuration): StructType = {
    val p = new Path(file)
    val in = p.getFileSystem(conf).open(p)
    val br = new BufferedReader(new InputStreamReader(in, UTF_8))
    try parseHeader(br.readLine(), file) finally br.close()
  }

  /** The catalog's authoritative schema for `dir` when its
    * `_graft_schema` is present, else None. Only a clean not-found
    * maps to None — a transient store error must propagate rather
    * than silently flipping the read's null-fill semantics between
    * retries. */
  private[sources] def catalogSchemaOf(dir: String): Option[StructType] = {
    if (dir == null) return None
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val sf = new Path(dir, GraftCatalog.SchemaName)
    val fs = sf.getFileSystem(conf)
    val exists =
      try fs.exists(sf)
      catch { case _: java.io.FileNotFoundException => false }
    if (exists) Some(GraftCatalog.readSchemaFile(fs, sf)) else None
  }

  /** Directory schema for path-based reads: the catalog's
    * `_graft_schema` when present (the AUTHORITY on an evolved table —
    * per-file headers legitimately disagree with each other after
    * ALTER ADD COLUMNS, and which one header-inference would pick is
    * an accident of file naming), else the first data file's header
    * (raw directories, where every file carries the same schema by
    * the writer's construction). */
  private[sources] def readDirSchema(dir: String): StructType =
    catalogSchemaOf(dir).getOrElse(readHeaderSchema(dir))

  private[sources] def readHeaderSchema(dir: String): StructType = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    val files = listDataFiles(dir, conf)
    require(files.nonEmpty, s"graftlines: no $Ext files under $dir")
    val in = fs.open(new Path(files.head))
    val br = new BufferedReader(new InputStreamReader(in, UTF_8))
    try parseHeader(br.readLine(), files.head) finally br.close()
  }

  private[sources] def listDataFiles(
      dir: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] =
    listDataFileStatuses(dir, conf).map(_._1)

  /** (path, length) per data file — lengths feed block splitting at
    * plan time, from the same single directory listing. */
  private[sources] def listDataFileStatuses(
      dir: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(Ext)
        && st.getLen > 0)
      .map(st => (st.getPath.toString, st.getLen)).sortBy(_._1)
  }

  private[sources] def typeToken(dt: DataType): String = dt match {
    case IntegerType => "int"
    case LongType => "long"
    case DoubleType => "double"
    case StringType => "string"
    case BooleanType => "bool"
    case DateType => "date"
    case TimestampType => "ts"
    case other => throw new IllegalArgumentException(
      s"graftlines cannot store type ${other.catalogString}")
  }

  private[sources] def tokenType(tok: String, where: String): DataType =
    tok match {
      case "int" => IntegerType
      case "long" => LongType
      case "double" => DoubleType
      case "string" => StringType
      case "bool" => BooleanType
      case "date" => DateType
      case "ts" => TimestampType
      case other => throw new IllegalArgumentException(
        s"graftlines: unknown type token '$other' in $where")
    }

  private[sources] def header(schema: StructType): String = {
    require(!schema.fieldNames.contains(FileCol),
      s"graftlines: '$FileCol' is the reserved metadata column name")
    // the header is a raw tab-separated line: a name holding a tab /
    // newline / CR would COMMIT a table no parseHeader can ever read
    // back — reject before any task launches, not at first read.
    // (Colons are fine: parseHeader splits on the LAST colon.)
    schema.fieldNames.foreach { n =>
      require(n.nonEmpty && !n.exists(c => c == '\t' || c == '\n'
          || c == '\r'),
        s"graftlines: column name ${n.replace("\t", "\\t")
          .replace("\n", "\\n").replace("\r", "\\r")} is empty or " +
          "contains a tab/newline/CR — unstorable in the header line")
      // '#'-prefixed names are reserved for stats-line markers: a user
      // column literally named '#len' would have its ordinary min/max
      // stats line parsed as the length cross-check (bogus fileLen,
      // dropped pruning stats), and a String '#len' Bloom line is
      // ambiguous. Reserve the whole prefix, mirroring FileCol — and
      // future markers then never collide with committed tables.
      require(!n.startsWith("#"),
        s"graftlines: column name '$n' — names starting with '#' are " +
          "reserved for stats-manifest markers")
    }
    schema.fields.map(f => s"${f.name}:${typeToken(f.dataType)}")
      .mkString("\t")
  }

  private[sources] def parseHeader(line: String, where: String): StructType = {
    require(line != null && line.nonEmpty, s"graftlines: empty header in $where")
    StructType(line.split('\t').toIndexedSeq.map { cell =>
      val i = cell.lastIndexOf(':')
      require(i > 0, s"graftlines: bad header cell '$cell' in $where")
      StructField(cell.substring(0, i),
        tokenType(cell.substring(i + 1), where))
    })
  }

  /** Escapes are what make raw split-on-tab / split-on-newline exact:
    * a data field never contains a literal tab, newline, CR or lone
    * backslash. `\N` as the ENTIRE field means NULL (any type). */
  private[sources] def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private[sources] def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case other => sb.append(c).append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse one field to its JVM-comparison value (String for strings —
    * UTF8String conversion happens only at row emission). */
  private[sources] def parseCell(raw: String, dt: DataType): Any = {
    if (raw == "\\N") return null
    dt match {
      case IntegerType | DateType => java.lang.Integer.valueOf(raw)
      case LongType | TimestampType => java.lang.Long.valueOf(raw)
      case DoubleType => java.lang.Double.valueOf(raw)
      case BooleanType => java.lang.Boolean.valueOf(raw)
      case StringType => unescape(raw)
      case other => throw new IllegalStateException(other.toString)
    }
  }

  /** Columns whose min/max may steer file skipping: exactly the types
    * whose pushed-filter comparisons the reader evaluates with
    * Spark-identical ordering. Strings are EXCLUDED on the same ground
    * min/max string aggregates are declined — java UTF-16 order vs
    * Spark UTF8-byte order diverge on supplementary characters, and a
    * wrong skip is silent data loss, not a perf bug. Date/timestamp
    * literals never push (GlFilters declines them), so their stats
    * would be dead weight. */
  private[sources] def statsEligible(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | BooleanType => true
    case _ => false
  }

  private[sources] def statsPath(dir: String) = new Path(dir, StatsName)

  /** Manifest maintenance shared by job commit and DELETE: drop every
    * line whose file is in `dropNames`, append `newLines` (already
    * base-name-prefixed), `replaceAll` discards the old manifest
    * entirely. Failures are swallowed — stats are an optimization and
    * must never fail a committed mutation. Rewrite goes via temp +
    * rename, not in-place create: a crash mid-write (or a reader
    * racing the rewrite) must see either the old complete manifest or
    * the new one, never a half-written file. Rename is atomic on HDFS
    * and the local FS; the delete-before-rename gap (rename onto an
    * existing path is not portable) degrades a concurrent reader to
    * "no stats", which is the designed fallback, not a wrong skip. */
  private[sources] def mergeStats(dir: String,
      conf: org.apache.hadoop.conf.Configuration,
      dropNames: Set[String], newLines: Seq[String],
      replaceAll: Boolean = false): Unit = {
    try {
      val p = statsPath(dir)
      val fs = p.getFileSystem(conf)
      val existing: Seq[String] =
        if (replaceAll || !fs.exists(p)) Nil
        else {
          val br = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
          try Iterator.continually(br.readLine()).takeWhile(_ != null)
            .toList.filterNot(l => dropNames.contains(l.takeWhile(_ != '\t')))
          finally br.close()
        }
      if (existing.isEmpty && newLines.isEmpty) { fs.delete(p, false); return }
      // writer-unique tmp (concurrent merges are last-writer-wins by
      // design — stats are best-effort — but they must not corrupt
      // each other's in-flight bytes), published with the same atomic
      // same-name replace as the COW rewrite so no crash instant
      // leaves the manifest absent (absence costs pruning + exact
      // counts table-wide until the next merge)
      val tmp = new Path(p.getParent,
        p.getName + "." + java.util.UUID.randomUUID().toString + ".tmp")
      try {
        val w = new OutputStreamWriter(fs.create(tmp, true), UTF_8)
        try (existing ++ newLines).foreach { l => w.write(l); w.write('\n') }
        finally w.close()
        if (!(isLocalScheme(fs) && replaceByMove(fs, tmp, p))) {
          fs.delete(p, false)
          if (!fs.rename(tmp, p)) fs.delete(tmp, false)
        }
      } catch {
        case t: Throwable =>
          // the uniquely-named tmp must not accumulate as permanent
          // debris across failed merges (the old fixed name at least
          // self-overwrote)
          try fs.delete(tmp, false) catch { case _: Throwable => () }
          throw t
      }
    } catch { case _: Exception => () }
  }

  /** Executor-side copy-on-write rewrite for DELETE: stream `file`,
    * drop every row satisfying the conjunction of `filters`, land the
    * survivors under the file's own name. On local filesystems the
    * same-name publish is ATOMIC (POSIX rename replaces the original
    * in place — [[replaceByMove]]), so no crash instant leaves the
    * file absent; elsewhere it is staged write + delete-original +
    * rename, whose per-file window is the documented non-atomicity of
    * a logless COW delete (the catalog/manifest layer is the
    * transactional answer, as for writes). Returns the file's fresh
    * stats lines, or Nil when every row matched and the file was
    * simply deleted. */
  private[sources] def rewriteWithoutMatches(file: String,
      schema: StructType, filters: Array[Filter],
      conf: org.apache.hadoop.conf.Configuration,
      nullFillMissing: Boolean): Seq[String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val dir = p.getParent.toString
    val base = p.getName
    val reader = new GlReader(file, schema, Array.empty, None, conf,
      nullFillMissing)
    val writer = new GlWriter(dir, schema, 0, 0L, conf,
      nameOverride = Some(base))
    val idx = schema.fieldNames.zipWithIndex.toMap
    try {
      while (reader.next()) {
        val row = reader.get()
        val get: String => Any = { n =>
          val i = idx(n)
          if (row.isNullAt(i)) null
          else schema.fields(i).dataType match {
            case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
            case LongType | TimestampType => java.lang.Long.valueOf(row.getLong(i))
            case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
            case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
            case StringType => row.getUTF8String(i).toString
            case other => throw new IllegalStateException(other.toString)
          }
        }
        if (!filters.forall(GlFilters.eval(_, get))) writer.write(row)
      }
    } catch { case e: Throwable => writer.abort(); reader.close(); throw e }
    reader.close()
    writer.commit() match {
      case GlCommitted(Some(staged), Some(fin), lines) =>
        if (!(isLocalScheme(fs)
            && replaceByMove(fs, new Path(staged), new Path(fin)))) {
          require(fs.delete(p, false),
            s"graftlines delete: could not remove $file before publish")
          require(fs.rename(new Path(staged), new Path(fin)),
            s"graftlines delete: could not publish rewritten $fin")
        }
        lines.map(l => s"$base\t$l")
      case _ => // no survivors: the whole file is deleted
        fs.delete(p, false)
        Nil
    }
  }

  /** Manifest read at plan time: baseName -> (rows, col -> (nulls, min,
    * max)); min/max already parsed to comparison values (null = column
    * all-NULL in that file). A missing/corrupt manifest means "no
    * stats" — skipping is an optimization and must never be load-
    * bearing, so any read problem degrades to scanning every file. */
  private[sources] def readStats(dir: String,
      conf: org.apache.hadoop.conf.Configuration,
      schema: StructType): Map[String, GlFileStats] = {
    val p = statsPath(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Map.empty
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    val br = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
    try {
      val byFile = scala.collection.mutable.Map[String, GlFileStats]()
      var line = br.readLine()
      while (line != null) {
        // per-LINE degradation: a line that passes the sentinel check
        // but still fails to parse (e.g. a non-numeric rows field)
        // drops ONLY itself — discarding the whole map here would
        // disable pruning/manifest-counts table-wide over one damaged
        // line, the opposite of the degrade-per-line design
        try line.split("\t", -1) match {
          case Array(file, rows, col, nulls, GlBloom.Marker, hex,
              StatsSentinel) if types.get(col).contains(StringType) =>
            // string-equality Bloom line (min slot carries the marker;
            // an older reader sees a not-stats-eligible column and
            // skips it). Damaged hex decodes to None -> no bloom, scan.
            // The null count on the line feeds Is[Not]Null pruning for
            // strings — the one stats use that needs no ordering.
            GlBloom.decode(hex).foreach { bits =>
              val st = byFile.getOrElseUpdate(file,
                GlFileStats(rows.toLong,
                  scala.collection.mutable.Map.empty))
              st.blooms(col) = bits
              st.strNulls(col) = nulls.toLong
            }
          case Array(file, rows, StatsLenMarker, _, len, _, StatsSentinel) =>
            // per-file byte-length cross-check line (see StatsLenMarker)
            val st = byFile.getOrElseUpdate(file,
              GlFileStats(rows.toLong,
                scala.collection.mutable.Map.empty))
            st.fileLen = Some(len.toLong)
          case Array(file, rows, col, nulls, mn, mx, StatsSentinel) =>
            types.get(col).filter(statsEligible).foreach { dt =>
              val st = byFile.getOrElseUpdate(file,
                GlFileStats(rows.toLong,
                  scala.collection.mutable.Map.empty))
              st.cols(col) = GlColStats(nulls.toLong,
                parseCell(mn, dt), parseCell(mx, dt))
            }
          // truncated (sentinel missing/cut) or unknown line shape:
          // ignore the line, never fail or mis-skip the scan
          case _ => ()
        } catch { case _: Exception => () }
        line = br.readLine()
      }
      byFile.toMap
    } catch { case _: Exception => Map.empty }
    finally br.close()
  }
}

/** Driver-side metadata-I/O counters (process-wide, monotonically
  * increasing — read a delta around the operation you care about).
  * The first customer is the streaming sink's committed-epoch ledger:
  * `epochTagReads` counts `#epoch:` manifest opens, which a
  * long-running stream must keep at O(new generations) per commit —
  * the soak test pins that claim with numbers instead of trusting the
  * cache's comment. */
private[sources] object GlMetrics {
  val epochTagReads = new java.util.concurrent.atomic.AtomicLong
}

private[sources] case class GlColStats(nulls: Long, min: Any, max: Any)
private[sources] case class GlFileStats(rows: Long,
    cols: scala.collection.mutable.Map[String, GlColStats],
    blooms: scala.collection.mutable.Map[String, Array[Long]] =
      scala.collection.mutable.Map.empty,
    strNulls: scala.collection.mutable.Map[String, Long] =
      scala.collection.mutable.Map.empty) {
  /** Byte length recorded on the file's `#len` stats line, if present.
    * Consumers that treat `rows` as EXACT (manifest COUNT(*), exact
    * planner numRows) must require this to equal the live
    * FileStatus length — a mismatch means the file was rewritten in
    * place and the best-effort stats merge did not land. */
  var fileLen: Option[Long] = None
}

/** Per-(file, string-column) Bloom filter riding the `_graft_stats`
  * manifest — equality file skipping for the one type family min/max
  * pruning deliberately declines (string ORDER is the UTF-16 vs UTF8
  * hazard; membership hashing has no order to get wrong). 8192 bits /
  * 4 probes ⇒ ~2% false positives at 1000 distinct values per file,
  * and a false positive only costs a scan — a Bloom "absent" answer is
  * exact, so skipping on it never loses rows. Line shape reuses the
  * 7-field stats format with the literal `bloomv1` in the min slot: a
  * pre-Bloom reader pattern-matches the same arity, finds the column
  * not stats-eligible, and ignores the line — forward/backward
  * compatible by construction. A truncated hex payload fails the
  * length gate in [[decode]] and degrades to scanning, same contract
  * as every other damaged manifest line. */
private[sources] object GlBloom {
  val Marker = "bloomv1"
  val NumBits = 8192
  val NumLongs: Int = NumBits / 64
  val NumHashes = 4

  /** Double hashing (h1 + i·h2 mod m) over the raw UTF-8 bytes — the
    * same value the reader's pushed-filter compare sees, BEFORE cell
    * escaping. */
  private def probes(s: String): Array[Int] = {
    val bytes = s.getBytes(UTF_8)
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x85ebca6b)
    Array.tabulate(NumHashes)(i => math.floorMod(h1 + i * h2, NumBits))
  }

  def add(bits: Array[Long], s: String): Unit =
    probes(s).foreach(b => bits(b >> 6) |= 1L << (b & 63))

  def mayContain(bits: Array[Long], s: String): Boolean =
    probes(s).forall(b => (bits(b >> 6) & (1L << (b & 63))) != 0)

  def encode(bits: Array[Long]): String =
    bits.map(l => f"$l%016x").mkString

  def decode(hex: String): Option[Array[Long]] =
    if (hex.length != NumLongs * 16 ||
      !hex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
      None
    else Some(Array.tabulate(NumLongs)(i =>
      java.lang.Long.parseUnsignedLong(hex.substring(i * 16, i * 16 + 16),
        16)))
}

/** Which V1 filters the source accepts for pushdown, and their exact
  * executor-side evaluation. Accepted ⇒ Spark drops its own copy, so
  * the semantics here must match Spark's to the bit: that is why
  * date/timestamp literals and NaN/−0.0 doubles are declined (residual)
  * rather than approximated.
  */
private[sources] object GlFilters {

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case AlwaysTrue() => true // DELETE without WHERE
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case Or(l, r) => supported(schema, l) && supported(schema, r)
    case Not(c) => supported(schema, c)
    case IsNull(a) => atomic(schema, a)
    case IsNotNull(a) => atomic(schema, a)
    case EqualTo(a, v) => litOk(schema, a, v)
    // <=> is total (never NULL-valued) and exactly expressible in the
    // three-valued evaluator; a null literal means "a IS NULL". NaN
    // literals decline like EqualTo's (Spark's NaN<=>NaN is true,
    // primitive compare semantics differ).
    case EqualNullSafe(a, v) =>
      if (v == null) atomic(schema, a) else litOk(schema, a, v)
    // byte-prefix on the same UTF-8 encoding utf8Cmp compares with —
    // identical to UTF8String.startsWith for any well-formed string
    case StringStartsWith(a, v) => stringCol(schema, a) && v != null
    case GreaterThan(a, v) => litOk(schema, a, v)
    case GreaterThanOrEqual(a, v) => litOk(schema, a, v)
    case LessThan(a, v) => litOk(schema, a, v)
    case LessThanOrEqual(a, v) => litOk(schema, a, v)
    case In(a, vs) => vs.nonEmpty && vs.forall(v => litOk(schema, a, v))
    case _ => false
  }

  private def field(schema: StructType, a: String): Option[StructField] =
    schema.fields.find(_.name == a) // flat schemas only; nested refs decline

  private def stringCol(schema: StructType, a: String): Boolean =
    field(schema, a).exists(_.dataType == StringType)

  private def atomic(schema: StructType, a: String): Boolean =
    field(schema, a).exists(f => f.dataType match {
      case IntegerType | LongType | DoubleType | StringType | BooleanType =>
        true
      case _ => false
    })

  private def litOk(schema: StructType, a: String, v: Any): Boolean =
    atomic(schema, a) && (v match {
      case null => false
      // NaN ordering/equality differs between Spark SQL and plain
      // java compares — decline, Spark keeps the residual. (-0.0 is
      // exact here: cmp uses primitive == first, so -0.0 = 0.0 holds.)
      case d: java.lang.Double => !d.isNaN
      case _: java.lang.Float => false // float col type unsupported anyway
      case _: Number | _: String | _: java.lang.Boolean => true
      case _: UTF8String => true
      case _ => false // dates, timestamps, decimals, binaries: residual
    })

  def references(f: Filter): Seq[String] = f.references.toSeq

  /** Exact evaluation over parsed values; a row passes iff the
    * predicate is DEFINITELY TRUE. `get` yields the JVM value of a
    * column for the current row. */
  def eval(f: Filter, get: String => Any): Boolean =
    eval3(f, get).contains(true)

  /** SQL THREE-VALUED evaluation — Some(true/false), None = NULL.
    * Accepted pushdown removes Spark's own copy of the predicate, so
    * this must match catalyst to the bit, and two-valued logic does
    * not: `NOT(v = 5)` on v = NULL is NULL in SQL (row dropped; rows
    * deleted only when TRUE), but a two-valued Not computes !(false) =
    * true. Bare-conjunct cases are rescued by the optimizer's inferred
    * IsNotNull constraints, which is exactly why the bug class hides:
    * an Or above the Not (`NOT(v = 5) OR s IS NULL`) blocks that
    * inference and the divergence goes live. Comparisons on a NULL
    * column value are None; And/Or use Kleene logic (false dominates
    * And, true dominates Or, otherwise NULL is contagious); Not maps
    * None to None. In-list NULL literals never reach here (declined at
    * push time), so In's NULL case is only a NULL probe value. */
  private def eval3(f: Filter, get: String => Any): Option[Boolean] =
    f match {
      case AlwaysTrue() => Some(true)
      case And(l, r) => (eval3(l, get), eval3(r, get)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval3(l, get), eval3(r, get)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval3(c, get).map(!_)
      case IsNull(a) => Some(get(a) == null)
      case IsNotNull(a) => Some(get(a) != null)
      case EqualTo(a, v) => withVal(get(a))(cmp(_, v) == 0)
      // total: NULL <=> NULL is true, NULL <=> lit is false — the one
      // comparison that never yields SQL NULL
      case EqualNullSafe(a, v) =>
        val x = get(a)
        if (v == null) Some(x == null)
        else Some(x != null && cmp(x, v) == 0)
      case StringStartsWith(a, v) =>
        withVal(get(a))(x => startsWithUtf8(x.toString, v))
      case GreaterThan(a, v) => withVal(get(a))(cmp(_, v) > 0)
      case GreaterThanOrEqual(a, v) => withVal(get(a))(cmp(_, v) >= 0)
      case LessThan(a, v) => withVal(get(a))(cmp(_, v) < 0)
      case LessThanOrEqual(a, v) => withVal(get(a))(cmp(_, v) <= 0)
      case In(a, vs) => withVal(get(a))(x => vs.exists(cmp(x, _) == 0))
      case other => throw new IllegalStateException(s"unpushable: $other")
    }

  private def withVal(x: Any)(p: Any => Boolean): Option[Boolean] =
    if (x == null) None else Some(p(x))

  /** Conservative file-level pruning: true ⇔ the file MAY hold a row
    * matching `f`, judged from per-column (nulls, min, max). Any
    * uncertainty — column missing from the manifest, a Not(...) — must
    * answer true: a kept file only costs time, a wrongly skipped file
    * loses rows. Note And maps to && (a matching row satisfies both
    * sides, so both must be possible) and Or to ||; a column whose
    * min/max are null is all-NULL in the file, so no comparison can
    * match it there. */
  def mayMatch(f: Filter, st: GlFileStats): Boolean = {
    def col(a: String): Option[GlColStats] = st.cols.get(a)
    def rng(a: String)(p: (Any, Any) => Boolean): Boolean =
      col(a).forall(c => c.min != null && p(c.min, c.max))
    // Bloom membership for string equality: "absent" is exact (skip is
    // safe), "present" is a maybe (scan). Columns without a bloom —
    // non-strings, pre-bloom manifests, damaged payloads — answer true.
    def bloom(a: String, v: Any): Boolean = st.blooms.get(a) match {
      case Some(bits) if v != null => GlBloom.mayContain(bits, v.toString)
      case _ => true
    }
    // null counts come from min/max lines for ordered types and from
    // bloom lines for strings; absence anywhere means "don't know"
    def nullsOf(a: String): Option[Long] =
      st.cols.get(a).map(_.nulls).orElse(st.strNulls.get(a))
    f match {
      case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
      case Or(l, r) => mayMatch(l, st) || mayMatch(r, st)
      case Not(_) => true
      case IsNull(a) => nullsOf(a).forall(_ > 0)
      case IsNotNull(a) => nullsOf(a).forall(st.rows > _)
      case EqualTo(a, v) =>
        rng(a)((mn, mx) => cmp(mn, v) <= 0 && cmp(mx, v) >= 0) &&
          bloom(a, v)
      case EqualNullSafe(a, null) => nullsOf(a).forall(_ > 0)
      case EqualNullSafe(a, v) =>
        rng(a)((mn, mx) => cmp(mn, v) <= 0 && cmp(mx, v) >= 0) &&
          bloom(a, v)
      // strings carry Bloom + null-count lines, not ordered min/max,
      // so a prefix predicate cannot prune on range; scan (exact
      // residual-free evaluation still happens row-side)
      case GreaterThan(a, v) => rng(a)((_, mx) => cmp(mx, v) > 0)
      case GreaterThanOrEqual(a, v) => rng(a)((_, mx) => cmp(mx, v) >= 0)
      case LessThan(a, v) => rng(a)((mn, _) => cmp(mn, v) < 0)
      case LessThanOrEqual(a, v) => rng(a)((mn, _) => cmp(mn, v) <= 0)
      case In(a, vs) => rng(a)((mn, mx) =>
        vs.exists(v => cmp(mn, v) <= 0 && cmp(mx, v) >= 0)) &&
        vs.exists(bloom(a, _))
      case _ => true
    }
  }

  private def cmp(colVal: Any, lit: Any): Int = colVal match {
    case i: java.lang.Integer =>
      java.lang.Long.compare(i.longValue(), num(lit).longValue())
    case l: java.lang.Long =>
      java.lang.Long.compare(l.longValue(), num(lit).longValue())
    case d: java.lang.Double =>
      val x = d.doubleValue(); val y = num(lit).doubleValue()
      if (x == y) 0 else java.lang.Double.compare(x, y)
    case s: String => utf8Cmp(s, lit.toString)
    case b: java.lang.Boolean =>
      java.lang.Boolean.compare(b, lit.asInstanceOf[java.lang.Boolean])
    case other => throw new IllegalStateException(
      s"uncomparable column value: $other")
  }

  /** Spark string ordering is UNSIGNED UTF-8 BYTE order
    * (UTF8String.compareTo), which differs from Java's UTF-16
    * code-unit compareTo exactly when a supplementary character
    * (surrogate-encoded, >= U+10000) meets a BMP char in
    * [U+E000, U+FFFF]: UTF-8 puts the supplementary LAST (0xF0 > 0xEE
    * lead byte), UTF-16 puts its 0xD800-range surrogate FIRST. Pushed
    * range filters are evaluated here INSTEAD of by Spark (accepted
    * pushdown leaves no residual), so this comparison must be
    * byte-identical to Spark's or hostile strings silently corrupt
    * range predicates. */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  private def num(lit: Any): Number = lit.asInstanceOf[Number]

  /** Spark's StartsWith is UTF8String.startsWith — a BYTE-prefix match
    * on the UTF-8 encoding. Equivalent to String.startsWith for
    * well-formed strings, but computed on the same bytes utf8Cmp
    * orders by, so the two pushed string predicates share one
    * encoding story. */
  private def startsWithUtf8(s: String, prefix: String): Boolean = {
    val x = s.getBytes(UTF_8); val p = prefix.getBytes(UTF_8)
    if (p.length > x.length) return false
    var i = 0
    while (i < p.length) {
      if (x(i) != p(i)) return false
      i += 1
    }
    true
  }
}

/** Copy-on-write `DELETE FROM` ([[SupportsDelete]]): the row-level
  * lifecycle op of real table formats, reachable through any catalog
  * identifier (`DELETE FROM graft_cat.ns.t WHERE …`). Only predicates
  * the reader can evaluate EXACTLY take this metadata path
  * (`canDeleteWhere` — same honesty contract as filter pushdown);
  * anything else (LIKE, subqueries, …) falls through to the
  * group-based rewrite below, which deletes exactly too. Execution:
  * `_graft_stats` prunes provably-untouched files at plan time — a
  * GDPR delete keyed on a user id rewrites only the files whose
  * min/max/bloom admit that key — and the affected files are rewritten
  * in PARALLEL executor tasks (one per file, data never through the
  * driver); their fresh stats lines replace the old manifest entries.
  * Per-file publish is staged-write + delete + rename; the cross-file
  * window of a logless COW delete is documented at
  * [[GraftLines.rewriteWithoutMatches]]. */
private[sources] class GlTable(path: String, tableSchema: StructType,
    nullFillMissing: Boolean = false,
    /** Set by the catalog's `VERSION AS OF` loadTable: every scan of
      * this Table instance reads that committed generation; writes are
      * rejected (you cannot write to the past). */
    pinnedVersion: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  require(path != null && path.nonEmpty, "graftlines requires a path")

  override def name(): String = s"graftlines `$path`"
  override def schema(): StructType = tableSchema

  /** `_file`: which data file holds the row — synthesized by the
    * readers, never stored. Also the group identity the row-level
    * operations request, which routes their writes through Spark's
    * metadata-projection task (rows arrive clean, no op column). */
  override def metadataColumns():
      Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = GraftLines.FileCol
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "data file holding the row"
    })
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // pinned catalog time travel wins; else the path-read options
    // `.option("versionAsOf", n)` / `.option("timestampAsOf", t)`
    // select a generation (t: epoch-ms, ISO instant, or SQL timestamp)
    val vOpt = Option(options.get("versionAsOf")).map { s =>
      require(s.toIntOption.isDefined,
        s"graftlines: versionAsOf must be an integer, got '$s'")
      s.toInt
    }
    val tOpt = Option(options.get("timestampAsOf"))
    require(vOpt.isEmpty || tOpt.isEmpty,
      "graftlines: versionAsOf and timestampAsOf are mutually exclusive")
    val v = pinnedVersion.orElse(vOpt).orElse(tOpt.map { t =>
      GraftLines.genAtTimestamp(path, GraftLines.parseTsOption(t),
        SparkSession.active.sparkContext.hadoopConfiguration)
    })
    // `.option("excludeFilesOfVersion", m)`: the CHANGE-FEED primitive.
    // Plan only the files of the read version that are NOT listed in
    // generation m's manifest. Versioned file names are never reused
    // across generations (see VersionMarker scaladoc), so a base name
    // common to both manifests is byte-identical in both versions.
    // "What changed between v1 and v3" is then two SMALL scans
    // (v3 minus v1-files, v1 minus v3-files) + one anti-join each,
    // independent of table size and of how many commits lie between —
    // instead of two full version scans.
    //
    // Equivalence precondition (stated, not enforced): the two-sided
    // EXCEPT over delta reads equals the EXCEPT over full version
    // scans iff no full row VALUE is duplicated across a common file
    // and a differing file of the same version — e.g. a row living in
    // untouched file C and also in rewritten file F would surface as a
    // spurious delete when F drops it, because the common file that
    // still holds it was (correctly) never scanned. Keyed/deduplicated
    // tables satisfy this by construction (each row value lives in
    // exactly one file per version); for multiset tables the delta
    // read is still exactly "the rows of the files that changed" — a
    // well-defined feed on its own — but not an EXCEPT replacement.
    val x = Option(options.get("excludeFilesOfVersion")).map { s =>
      require(s.toIntOption.isDefined,
        s"graftlines: excludeFilesOfVersion must be an integer, got '$s'")
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val gens = GraftLines.genVersions(path, conf)
      require(gens.contains(s.toInt),
        s"graftlines: excludeFilesOfVersion ${s.toInt} on $path " +
          s"(committed generations: ${gens.mkString(", ")})")
      s.toInt
    }
    new GlScanBuilder(path, tableSchema, nullFillMissing, v, x)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"graftlines: cannot write to $path pinned at VERSION AS OF " +
        s"${pinnedVersion.getOrElse(-1)} — writes go to the live table")
    // `.option("partitionColumn", col)` (or the table's existing
    // `_graft_partcol` marker): identity-partitioned writes — rows
    // cluster by the column and each task lands ONE FILE PER VALUE,
    // the invariant behind storage-partitioned joins (see the marker's
    // scaladoc in [[GraftLines]]).
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val bspec = GraftLines.bucketSpec(path, conf)
    bspec.foreach { case (c, _) =>
      require(info.schema().fieldNames.contains(c),
        s"graftlines: bucket column '$c' is not in the write schema")
    }
    val pcol = Option(info.options.get("partitionColumn")).filter(_.nonEmpty)
      .orElse(GraftLines.partitionCol(path, conf))
    require(pcol.isEmpty || bspec.isEmpty,
      "graftlines: a table cannot be both identity- and bucket-partitioned")
    pcol.foreach { c =>
      val f = info.schema().fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"graftlines: partitionColumn '$c' is not in the write schema "
            + info.schema().fieldNames.mkString("[", ", ", "]")))
      require(GraftLines.statsEligible(f.dataType),
        s"graftlines: partitionColumn '$c' must be an ordered non-string "
          + s"type (stats recover the per-file value); got ${f.dataType}")
    }
    // `.option("clusterBy", col)`: the write REQUESTS a range
    // distribution + sort on that column (see GlWrite), so files land
    // with tight, disjoint stats ranges and later scans prune sharply
    val cb = Option(info.options.get("clusterBy")).filter(_.nonEmpty)
    require(cb.isEmpty || pcol.isEmpty,
      "graftlines: clusterBy and partitionColumn are mutually exclusive")
    cb.foreach { c =>
      require(info.schema().fieldNames.contains(c),
        s"graftlines: clusterBy column '$c' is not in the write schema " +
          info.schema().fieldNames.mkString("[", ", ", "]"))
    }
    // `.option("clusterPartitions", n)`: pin the number of range
    // partitions (= output files); without it the engine (incl. AQE
    // coalescing) decides
    val cp = Option(info.options.get("clusterPartitions")).map { v =>
      require(v.toIntOption.exists(_ >= 1),
        s"graftlines: clusterPartitions must be a positive int, got '$v'")
      v.toInt
    }
    new GlWriteBuilder(path, info.schema(), cb, cp, pcol, bspec,
      queryId = info.queryId())
  }

  /** Versioned tables decline the metadata DELETE path entirely: it
    * rewrites files IN PLACE, which would corrupt committed history.
    * Spark then routes the DELETE through the row-level COW machinery
    * below, whose replace-commit is generation-aware. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    !GraftLines.isVersioned(path,
      SparkSession.active.sparkContext.hadoopConfiguration) &&
      filters.forall(GlFilters.supported(tableSchema, _))

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val files = GraftLines.listDataFiles(path, conf)
    // same conservative pruning as the scan: a file is untouched when
    // stats PROVE no row satisfies the delete conjunction
    val stats = GraftLines.readStats(path, conf, tableSchema)
    val affected = files.filter { f =>
      stats.get(new Path(f).getName)
        .forall(st => filters.forall(GlFilters.mayMatch(_, st)))
    }
    if (affected.isEmpty) return
    val sconf = new SerializableConfiguration(conf)
    val schema = tableSchema
    val nfm = nullFillMissing
    val newLines = spark.sparkContext
      .parallelize(affected, affected.size)
      .map(f => GraftLines.rewriteWithoutMatches(f, schema, filters,
        sconf.value, nfm))
      .collect().flatten.toSeq
    GraftLines.mergeStats(path, conf,
      dropNames = affected.map(new Path(_).getName).toSet,
      newLines = newLines)
  }

  /** Group-based (copy-on-write) UPDATE / MERGE / complex DELETE:
    * Spark rewrites the statement into a ReplaceData plan — read every
    * row of the AFFECTED groups through [[GlGroupScanBuilder]] (files
    * are the groups; condition filters prune files via `_graft_stats`
    * but NEVER drop rows, so carry-over rows survive the rewrite),
    * apply the modification, and hand the full replacement rows to
    * [[GlReplaceWrite]], whose commit deletes exactly the scanned
    * files and publishes the staged replacements. DELETE statements
    * whose predicate `canDeleteWhere` accepts still take the cheaper
    * metadata path above; subquery deletes fall through to this one. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new GlRowLevelOperation(path, tableSchema, nullFillMissing,
          info.command)
    }
}

/** One UPDATE/MERGE/DELETE rewrite: shared state between the scan that
  * plans the affected groups and the write that replaces them. */
private[sources] class GlRowLevelOperation(path: String,
    schema: StructType, nullFillMissing: Boolean,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Files the row-level scan planned — the groups commit replaces.
    * Written at plan time on the driver; re-planning overwrites. */
  @volatile private[sources] var scannedFiles: Seq[String] = Nil

  override def command(): RowLevelOperation.Command = cmd

  /** Ask for `_file`: it routes the replacement write through Spark's
    * metadata-projection task, so data rows arrive already stripped of
    * the operation column (the writer-side strip stays as a fallback
    * for metadata-free plans). */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftLines.FileCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GlGroupScanBuilder(this, path, schema, nullFillMissing)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GlReplaceWrite(path, info.schema(), GlRowLevelOperation.this)
    }

  override def description(): String = s"graftlines COW $cmd on $path"
}

/** Scan side of a group-based rewrite. CONTRACT (the part a row-level
  * scan must get right): pushed condition filters prune GROUPS only —
  * every filter is returned as residual and the readers row-filter
  * NOTHING, because the replacement write must receive the carry-over
  * rows of affected files, not just the matching ones. Column pruning
  * and limits are likewise not offered: ReplaceData rewrites whole
  * rows. */
private[sources] class GlGroupScanBuilder(op: GlRowLevelOperation,
    path: String, schema: StructType, nullFillMissing: Boolean)
    extends ScanBuilder with SupportsPushDownFilters {

  private var groupFilters: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    groupFilters = filters.filter(GlFilters.supported(schema, _))
    filters // ALL residual — file pruning only, rows stay intact
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan =
    // full rows + the `_file` group column requiredMetadataAttributes
    // promised (readers synthesize it)
    GlScan(path,
      schema.add(StructField(GraftLines.FileCol, StringType,
        nullable = false)),
      Array.empty, None, None, schema, nullFillMissing,
      groupPrune = groupFilters,
      onPlan = Some(files => op.scannedFiles = files))
}

/** Write side of a group-based rewrite: staged task writers exactly as
  * [[GlWrite]], but commit REPLACES the scanned groups — deletes the
  * files the paired scan planned, publishes the staged files, and
  * swaps the affected manifest lines. The delete-then-publish window
  * is the same documented non-atomicity as overwrite's truncation;
  * the catalog layer is the transactional answer. */
private[sources] class GlReplaceWrite(path: String, schema: StructType,
    op: GlRowLevelOperation) extends Write with BatchWrite {
  GraftLines.header(schema) // reject unstorable types before tasks launch

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    dir.getFileSystem(conf).mkdirs(dir)
    GlOpStrippingFactory(
      GlWriterFactory(path, schema, new SerializableConfiguration(conf)),
      schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val staged = messages.collect {
      case GlCommitted(Some(s), Some(f), _) => (new Path(s), new Path(f))
    }
    val victims = op.scannedFiles
    if (GraftLines.isVersioned(path, conf)) {
      // Versioned COW: victims stay on disk (older generations still
      // reference them); the new generation = previous minus the
      // rewritten groups plus the replacements. An UPDATE/DELETE/MERGE
      // thereby becomes time-travelable for free — `VERSION AS OF n`
      // replays the pre-statement table from the SAME bytes. Victim
      // stats lines survive for the same reason.
      val gens = GraftLines.genVersions(path, conf)
      val next = gens.lastOption.getOrElse(0) + 1
      def vname(f: Path): Path = new Path(f.getParent,
        f.getName.stripSuffix(GraftLines.Ext) + s"-g$next${GraftLines.Ext}")
      val fmap: Map[String, String] =
        staged.map { case (_, f) => f.getName -> vname(f).getName }.toMap
      staged.foreach { case (s, f) =>
        val tgt = vname(f)
        require(!fs.exists(tgt),
          s"graftlines: versioned replace target $tgt already exists — " +
            "concurrent committers race on the generation number")
        require(fs.rename(s, tgt),
          s"graftlines: versioned replace-commit failed renaming $s -> $tgt")
      }
      val victimBases = victims.map(f => new Path(f).getName).toSet
      val carried = gens.lastOption.map(GraftLines.readGen(path, _, conf))
        .getOrElse(GraftLines.listDataFiles(path, conf)
          .map(new Path(_).getName))
        .filterNot(victimBases)
      val newBases = staged.map { case (_, f) => fmap(f.getName) }
      GraftLines.writeGen(path, next, carried ++ newBases, conf)
      val newLines = messages.flatMap {
        case GlCommitted(_, Some(f), lines) =>
          val base = fmap(new Path(f).getName)
          lines.map(l => s"$base\t$l")
        case _ => Nil
      }
      if (newLines.nonEmpty)
        GraftLines.mergeStats(path, conf, dropNames = Set.empty,
          newLines = newLines)
      return
    }
    victims.foreach(f => fs.delete(new Path(f), false))
    staged.foreach { case (s, f) =>
      if (fs.exists(f)) fs.delete(f, false)
      require(fs.rename(s, f),
        s"graftlines: replace-commit failed renaming $s -> $f")
    }
    val newLines = messages.flatMap {
      case GlCommitted(_, Some(f), lines) =>
        val base = new Path(f).getName
        lines.map(l => s"$base\t$l")
      case _ => Nil
    }
    GraftLines.mergeStats(path, conf,
      dropNames = victims.map(new Path(_).getName).toSet
        ++ newLines.map(_.takeWhile(_ != '\t')),
      newLines = newLines.toSeq)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    messages.collect { case GlCommitted(Some(s), _, _) =>
      fs.delete(new Path(s), false)
    }
  }
}

/** One pushed aggregate function: kind ∈ countstar|count|min|max,
  * col None only for countstar. */
private[sources] case class GlAggFunc(kind: String, col: Option[String])

/** A pushed (partial) aggregation: per-partition pre-aggregation the
  * source computes; Spark's final aggregate merges partitions. */
private[sources] case class GlAggSpec(groupCols: Seq[String],
    funcs: Seq[GlAggFunc])

private[sources] class GlScanBuilder(path: String, schema: StructType,
    nullFillMissing: Boolean = false, versionAsOf: Option[Int] = None,
    excludeFilesOf: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var agg: Option[GlAggSpec] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(GlFilters.supported(schema, _))
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Per-partition early stop. `isPartiallyPushed` stays at its default
    * (true): each file reader stops after `limit` surviving rows, and
    * Spark's own global Limit does the cross-partition cut — the only
    * sound split for a multi-file scan. Catalyst only pushes a limit
    * here when every filter between it and the scan was itself pushed,
    * and pushed filters run in the reader BEFORE rows are counted, so
    * limit-after-filter semantics hold exactly. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** PARTIAL aggregate pushdown (supportCompletePushDown stays false):
    * the scan emits one pre-aggregated row per (partition, group) and
    * Spark's final aggregate merges them — the shape that turns a
    * count/min/max over N rows into one row per file at the source.
    * All-or-nothing: any untranslatable piece declines the whole
    * aggregation and the ordinary row scan stands. Min/max on strings
    * are declined deliberately — java String ordering is UTF-16
    * code-unit order while Spark compares UTF8 bytes (code points);
    * they differ on supplementary characters, and an exactness
    * contract can't ride on "the data is probably ASCII". */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def ref(e: V2Expression): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        Some(f.fieldNames()(0)).filter(n => schema.fieldNames.contains(n))
      case _ => None
    }
    def ordered(n: String): Boolean =
      schema.fields.find(_.name == n).exists(_.dataType match {
        case IntegerType | LongType | DoubleType | DateType |
             TimestampType => true
        case _ => false
      })
    val groups = aggregation.groupByExpressions.toSeq.map(ref)
    if (groups.exists(_.isEmpty)) return false
    val funcs = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(GlAggFunc("countstar", None))
      case c: Count if !c.isDistinct =>
        ref(c.column).map(n => GlAggFunc("count", Some(n)))
      case m: Min =>
        ref(m.column).filter(ordered).map(n => GlAggFunc("min", Some(n)))
      case m: Max =>
        ref(m.column).filter(ordered).map(n => GlAggFunc("max", Some(n)))
      case _ => None // avg/sum/distinct/...: decline, keep the row scan
    }
    if (funcs.exists(_.isEmpty)) return false
    agg = Some(GlAggSpec(groups.map(_.get), funcs.map(_.get)))
    true
  }

  override def build(): Scan = {
    val hconf = SparkSession.active.sparkContext.hadoopConfiguration
    GlScan(path, required, pushed, limit, agg,
      schema, nullFillMissing, versionAsOf = versionAsOf,
      partCol = GraftLines.partitionCol(path, hconf),
      buckets = GraftLines.bucketSpec(path, hconf),
      excludeFilesOf = excludeFilesOf)
  }
}

/** Public (not `private[sources]`) so plan tests can reach into
  * BatchScanExec and assert on `pushed`/`readSchema` directly.
  *
  * When `aggSpec` is set the scan's output IS the partial aggregation:
  * group columns first (Spark zips them positionally), then one column
  * per aggregate function (counts as long, min/max in the column's own
  * type). `required` is the FULL table schema in that case — Spark
  * builds the scan inside aggregate pushdown, before column pruning
  * would run — and per-group state is O(groups) per file (documented:
  * the same memory shape any partial hash aggregate has). */
case class GlScan(path: String, required: StructType,
    pushed: Array[Filter], pushedLimit: Option[Int] = None,
    aggSpec: Option[GlAggSpec] = None,
    tableSchema: StructType = new StructType(),
    nullFillMissing: Boolean = false,
    /** Row-level-op extras: `groupPrune` filters skip FILES only (rows
      * are never dropped — the readers see `pushed`, which stays empty
      * on such scans); `onPlan` reports the surviving file set to the
      * operation so its replace-commit knows which groups to swap. */
    groupPrune: Array[Filter] = Array.empty,
    onPlan: Option[Seq[String] => Unit] = None,
    /** Time travel: plan this committed generation instead of the
      * latest (versioned tables only — see GraftLines.VersionMarker). */
    versionAsOf: Option[Int] = None,
    /** The table's identity-partition column (`_graft_partcol`), when
      * declared — enables KeyGroupedPartitioning reporting below. */
    partCol: Option[String] = None,
    /** Bucket partitioning (`_graft_buckets`): (column, numBuckets). */
    buckets: Option[(String, Int)] = None,
    /** Change-feed file delta: plan only files NOT listed in this
      * generation's manifest (option `excludeFilesOfVersion` — see
      * [[GlTable.newScanBuilder]] for the correctness argument). */
    excludeFilesOf: Option[Int] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  /** Runtime group filtering (row-level ops): before planning a
    * group-based rewrite, Spark runs a subquery for `DISTINCT _file`
    * of the rows matching the statement's condition and delivers it
    * here as `IN(_file, …)` — so a MERGE whose ON condition pushes no
    * static filter still rewrites ONLY the files that hold matching
    * rows, exactly (names, not stats). Unrecognized predicate shapes
    * are ignored — pruning is an optimization, never load-bearing. */
  @transient private var runtimeAllowedFiles: Option[Set[String]] = None

  /** Advertise `_file` for runtime filtering ONLY when this scan
    * actually outputs it (row-level-operation scans, where Spark
    * requested it via requiredMetadataAttributes). On an ordinary scan
    * `_file` is not in the output, and Spark's runtime-filtering rules
    * resolve filterAttributes against the scan output — advertising an
    * absent column there throws at planning time the moment a join
    * against this scan becomes broadcastable. */
  override def filterAttributes(): Array[NamedReference] =
    if (required.fieldNames.contains(GraftLines.FileCol))
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(GraftLines.FileCol))
    else Array.empty

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val sets = predicates.flatMap { p =>
      if (p.name() != "IN" || p.children().isEmpty) None
      else p.children()(0) match {
        case ref: NamedReference
            if ref.fieldNames.toSeq == Seq(GraftLines.FileCol) =>
          val vals = p.children().drop(1).map {
            case l: org.apache.spark.sql.connector.expressions.Literal[_]
                if l.dataType == StringType =>
              Option(l.value).map(_.toString).orNull
            case _ => null
          }
          // any unconvertible element voids the whole predicate — a
          // partial IN-list would wrongly skip files
          if (vals.contains(null)) None else Some(vals.toSet)
        case _ => None
      }
    }
    if (sets.nonEmpty)
      runtimeAllowedFiles = Some(sets.reduce(_ intersect _))
  }

  /** Filter columns may be pruned out of `required` (Spark removes
    * pushed filters from the plan before pruning), so stats typing uses
    * the full table schema when the builder provided it. */
  private def statsSchema: StructType =
    if (tableSchema.fields.nonEmpty) tableSchema else required

  private def fieldOf(n: String): StructField =
    required.fields.find(_.name == n).getOrElse(throw
      new IllegalStateException(s"graftlines: pushed agg references "
        + s"'$n' outside the scan schema ${required.catalogString}"))

  private[sources] def aggOutput(spec: GlAggSpec): StructType =
    StructType(spec.groupCols.map(fieldOf) ++
      spec.funcs.zipWithIndex.map { case (f, i) =>
        f.kind match {
          case "countstar" | "count" => StructField(s"agg_$i", LongType)
          case _ => StructField(s"agg_$i", fieldOf(f.col.get).dataType)
        }
      })

  override def readSchema(): StructType =
    aggSpec.map(aggOutput).getOrElse(required)

  override def toBatch: Batch = this

  /** Post-pruning statistics for the planner ([[SupportsReportStatistics]]):
    * sizeInBytes = the bytes of exactly the files this scan will plan
    * (pushed + group filters applied against `_graft_stats`), and
    * numRows = their exact manifest row counts when every surviving
    * file carries a stats line (absent otherwise — never guess). This
    * is what lets AQE/join planning see a filtered graftlines scan as
    * broadcast-small even though the directory is huge: the estimate
    * shrinks WITH the pruning, as every real table format's does. All
    * driver-side metadata — one manifest read, no file opens. */
  /** The scan's file universe: the read version's files, minus (for a
    * change-feed read) every file also listed in `excludeFilesOf`'s
    * manifest. ALL downstream planning — statistics, pruning, keyed
    * plans, the manifest count — works from this one resolution, so
    * the delta read behaves exactly like a small table. */
  private def resolvedFiles(
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val all = GraftLines.resolveDataFileStatuses(path, conf, versionAsOf)
    excludeFilesOf match {
      case None => all
      case Some(m) =>
        val excl = GraftLines.readGen(path, m, conf).toSet
        all.filterNot { case (f, _) => excl.contains(new Path(f).getName) }
    }
  }

  // ONE metadata snapshot per scan: estimateStatistics (planning),
  // outputPartitioning/keyedPlan, and planInputPartitions (execution)
  // all consult the file list and the stats manifest — without these
  // caches a single filtered scan re-lists the directory and re-reads
  // the manifest up to four times on the driver (noticeable on object
  // stores). Same per-instance lifetime keyedPlan already relies on;
  // Spark caches planInputPartitions per Dataset anyway, so this adds
  // no staleness window that did not already exist.
  @transient private lazy val fileUniverse: Seq[(String, Long)] =
    resolvedFiles(SparkSession.active.sparkContext.hadoopConfiguration)
  @transient private lazy val statsCache: Map[String, GlFileStats] =
    GraftLines.readStats(path,
      SparkSession.active.sparkContext.hadoopConfiguration, statsSchema)

  /** The ONE freshness rule for serving a manifest row count as exact
    * (manifest COUNT(*), planner numRows): the file's stats line must
    * carry a `#len` equal to its LIVE length — stats merges are
    * best-effort, and a same-name COW rewrite whose merge failed
    * leaves a stale count behind that only the length can expose.
    * Both consumers go through here so the rule cannot drift apart. */
  private def freshRows(stats: Map[String, GlFileStats],
      file: String, liveLen: Long): Option[Long] =
    stats.get(new Path(file).getName)
      .filter(_.fileLen.contains(liveLen)).map(_.rows)

  override def estimateStatistics():
      org.apache.spark.sql.connector.read.Statistics = {
    val files = fileUniverse
    val stats = statsCache
    val pruners = pushed ++ groupPrune
    val kept = files.filter { case (f, _) =>
      stats.get(new Path(f).getName)
        .forall(st => pruners.forall(GlFilters.mayMatch(_, st)))
    }
    val bytes = kept.map(_._2).sum
    // numRows is only a planner hint, but it rides the same freshness
    // proof as the manifest COUNT(*) — see freshRows
    val keptRows = kept.map { case (f, len) => freshRows(stats, f, len) }
    val rowsOpt =
      if (keptRows.forall(_.isDefined)) Some(keptRows.flatten.sum) else None
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(bytes)
      override def numRows(): util.OptionalLong =
        rowsOpt.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty())
    }
  }

  override def description(): String =
    s"GraftLines path=$path, " +
      s"ReadSchema: ${readSchema().catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"PushedLimit: ${pushedLimit.getOrElse(-1)}, " +
      s"PushedAggregation: ${aggSpec.getOrElse("none")}" +
      excludeFilesOf.fold("")(m => s", ExcludeFilesOfVersion: $m")

  /** Identity-partitioned planning: when the table declares a
    * partition column AND every surviving file's stats prove it holds
    * exactly one non-null value (min == max, nulls == 0), the scan can
    * key every split by that value and report KeyGroupedPartitioning —
    * the storage-partitioned-join contract. Any file that cannot prove
    * single-valuedness (pre-partitioning data, a compacted layout, a
    * damaged manifest) degrades the WHOLE scan to the ordinary path:
    * correctness never rides on the grouping, only the exchange-free
    * join plan does. Row-level-op scans (`_file` in the output),
    * aggregate/limit pushdown scans keep the ordinary path too. */
  private def keyedEligible: Boolean =
    aggSpec.isEmpty && pushedLimit.isEmpty && groupPrune.isEmpty &&
      onPlan.isEmpty && !required.fieldNames.contains(GraftLines.FileCol)

  private def prunedFiles(
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val files = fileUniverse
    val stats = statsCache
    files.filter { case (f, _) =>
      stats.get(new Path(f).getName)
        .forall(st => pushed.forall(GlFilters.mayMatch(_, st)))
    }
  }

  @transient private lazy val keyedPlan: Option[Seq[(String, Long, Any)]] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    if (!keyedEligible) None
    else buckets match {
      case Some((_, n)) =>
        // bucket id rides the file name — every planned file must carry
        // one IN RANGE [0, n), else the whole scan degrades
        // (pre-bucketing data, or files copied in from a table bucketed
        // with a different n: an id >= n is a KeyGroupedPartitioning
        // key the registered bucket function can never produce, so it
        // must degrade like every other unprovable layout)
        val keyed = prunedFiles(conf).map { case (f, len) =>
          GraftLines.bucketIdOf(new Path(f).getName)
            .filter(b => b >= 0 && b < n)
            .map(b => (f, len, java.lang.Integer.valueOf(b): Any))
        }
        if (keyed.nonEmpty && keyed.forall(_.isDefined)) Some(keyed.flatten)
        else None
      case None => partCol.flatMap { pc =>
        val stats = statsCache
        val keyed = prunedFiles(conf).map { case (f, len) =>
          stats.get(new Path(f).getName).flatMap(_.cols.get(pc)).collect {
            case GlColStats(0, mn, mx) if mn != null && mn == mx =>
              (f, len, mn)
          }
        }
        if (keyed.nonEmpty && keyed.forall(_.isDefined)) Some(keyed.flatten)
        else None
      }
    }
  }

  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyedPlan match {
      case Some(kf) =>
        val expr = buckets match {
          case Some((c, n)) =>
            org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
          case None =>
            org.apache.spark.sql.connector.expressions.Expressions
              .identity(partCol.get)
        }
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(Array(expr), kf.map(_._3).distinct.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  /** File skipping happens HERE, at plan time: pushed filters are
    * tested against the `_graft_stats` manifest (one driver-side read)
    * and a file whose min/max prove it cannot hold a matching row never
    * becomes a partition — no task, no open, no parse. Files absent
    * from the manifest always scan (stats are an optimization, never a
    * correctness dependency). The same pruning feeds aggregate-pushdown
    * scans, since pushed filters apply before aggregation.
    *
    * Surviving files larger than `spark.sql.files.maxPartitionBytes`
    * are block-split into byte ranges — scan parallelism is bounded by
    * data volume, not file count, so a directory of a few giant files
    * still fans out across the cluster. Range ownership is the
    * text-split rule: a split owns exactly the lines whose FIRST byte
    * falls inside it (readers scan to the next newline — see
    * [[GlReader]]), so any split-size choice yields the same rows. */
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    // COUNT(*)-only pushed aggregations with no filters answer from
    // the stats manifest alone — one metadata read, ZERO data-file
    // opens (the Iceberg/Delta manifest-count move). Strictly gated:
    // every planned file must carry an intact stats line (rows ride
    // the same sentinel-protected lines pruning trusts), any filter /
    // group column / runtime predicate falls back to the scan, and an
    // empty file set keeps the ordinary empty-scan machinery (its
    // mandatory partial row makes COUNT 0, never null).
    aggSpec match {
      case Some(spec) if spec.groupCols.isEmpty
          && spec.funcs.nonEmpty
          && spec.funcs.forall(_.kind == "countstar")
          && pushed.isEmpty && groupPrune.isEmpty
          && runtimeAllowedFiles.isEmpty =>
        val files = fileUniverse
        val stats = statsCache
        // served as an EXACT result, so every file needs the length-
        // verified freshness proof (see freshRows); any file without
        // one degrades the whole count to the ordinary scan
        val rows = files.map { case (f, len) => freshRows(stats, f, len) }
        if (files.nonEmpty && rows.forall(_.isDefined))
          return Array(GlStatsCountPartition(rows.flatten.sum,
            spec.funcs.length))
      case _ => ()
    }
    keyedPlan match {
      case Some(kf) =>
        val splitSize =
          math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
        return kf.flatMap { case (f, len, v) =>
          def key = new GenericInternalRow(Array[Any](v))
          if (len <= splitSize)
            Seq(GlKeyedPartition(f, 0L, Long.MaxValue, key))
          else (0L until len by splitSize).map(s0 =>
            GlKeyedPartition(f, s0, math.min(s0 + splitSize, len), key))
        }.toArray
      case None => ()
    }
    val files = fileUniverse
    val pruners = pushed ++ groupPrune
    val statKept = if (pruners.isEmpty) files else {
      val stats = statsCache
      files.filter { case (f, _) =>
        val base = new Path(f).getName
        stats.get(base).forall(st => pruners.forall(GlFilters.mayMatch(_, st)))
      }
    }
    val kept = runtimeAllowedFiles match {
      case Some(allowed) => statKept.filter { case (f, _) => allowed(f) }
      case None => statKept
    }
    onPlan.foreach(_(kept.map(_._1)))
    val splitSize =
      math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    kept.flatMap { case (f, len) =>
      if (len <= splitSize) Seq(GlInputPartition(f, 0L, Long.MaxValue))
      else (0L until len by splitSize).map(s =>
        GlInputPartition(f, s, math.min(s + splitSize, len)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    GlReaderFactory(required, pushed, pushedLimit, aggSpec, conf,
      nullFillMissing)
  }

  /** TABLE AS A STREAM: `spark.readStream` over a VERSIONED table.
    * The generation manifests double as streaming offsets — offset N
    * IS committed generation N, so a micro-batch is exactly "the files
    * generation `end` lists that generation `start` did not" (the
    * Delta readStream posture, reconstructed from the same versioning
    * primitive). Filters/column pruning pushed into this ScanBuilder
    * apply to every micro-batch. Checkpointed offsets survive restart:
    * gen numbers are stable on disk, so resume is exact with no
    * re-emission. Honest limits (documented, spec-pinned): the source
    * is APPEND-driven — a COW rewrite's replacement files stream as
    * new files (the ignoreChanges caveat every file-log stream has),
    * and a retention sweep that expires a not-yet-consumed generation
    * fails the stream loudly rather than silently skipping rows. */
  override def toMicroBatchStream(checkpointLocation: String):
      MicroBatchStream = {
    require(aggSpec.isEmpty && pushedLimit.isEmpty,
      "graftlines streaming: aggregate/limit pushdown not offered")
    require(excludeFilesOf.isEmpty,
      "graftlines streaming: excludeFilesOfVersion is a batch change-" +
        "feed option; the streaming source IS the incremental feed " +
        "(offsets are generations) — drop the option")
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    require(GraftLines.isVersioned(path, conf),
      s"graftlines: streaming reads require a VERSIONED table " +
        s"(generations are the offsets) — $path has no version marker")
    new GlMicroBatchStream(path, required, pushed, nullFillMissing)
  }
}

/** Streaming offset = committed generation number. */
private[sources] case class GlOffset(gen: Int) extends Offset {
  override def json(): String = gen.toString
}

private[sources] class GlMicroBatchStream(path: String,
    required: StructType, pushed: Array[Filter],
    nullFillMissing: Boolean) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private def conf = SparkSession.active.sparkContext.hadoopConfiguration

  /** Trigger.AvailableNow ("process everything that exists, then
    * stop" — the batch-cadence way to run a streaming pipeline): the
    * engine calls this once at query start; the latest generation AT
    * THAT MOMENT becomes the run's ceiling, so generations committed
    * while the run drains are left for the NEXT run instead of keeping
    * this one alive. Gen numbers only grow, so the cap is stable. */
  @transient private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap =
      Some(GraftLines.genVersions(path, conf).lastOption.getOrElse(0))

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      Offset = {
    val latest = GraftLines.genVersions(path, conf).lastOption.getOrElse(0)
    GlOffset(availableNowCap.fold(latest)(math.min(latest, _)))
  }

  override def reportLatestOffset(): Offset =
    GlOffset(GraftLines.genVersions(path, conf).lastOption.getOrElse(0))

  override def initialOffset(): Offset = GlOffset(0)

  override def latestOffset(): Offset =
    GlOffset(GraftLines.genVersions(path, conf).lastOption.getOrElse(0))

  override def deserializeOffset(json: String): Offset =
    GlOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GlOffset].gen
    val e = end.asInstanceOf[GlOffset].gen
    if (e <= s) return Array.empty
    // gen 0 = before the first commit. A consumed generation expired
    // by a retention sweep mid-stream throws on readGen — loud, never
    // a silent row skip.
    val before: Set[String] =
      if (s == 0) Set.empty else GraftLines.readGen(path, s, conf).toSet
    val fresh0 = GraftLines.readGen(path, e, conf).filterNot(before)
    // stats-manifest pruning, same as the batch scan: a pushed filter
    // whose min/max/Bloom provably matches nothing in a fresh file
    // skips that file — without this, every micro-batch re-reads files
    // the batch path would never open (the reader stays exact either
    // way; this is pure IO)
    val fresh = if (pushed.isEmpty) fresh0 else {
      val stats = GraftLines.readStats(path, conf, required)
      fresh0.filter(base => stats.get(base)
        .forall(st => pushed.forall(GlFilters.mayMatch(_, st))))
    }
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val spark = SparkSession.active
    val splitSize =
      math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    // ONE directory listing serves every fresh file's length — the
    // per-file getFileStatus loop cost N namenode RPCs per micro-batch
    val lens: Map[String, Long] =
      GraftLines.listDataFileStatuses(path, conf)
        .map { case (f, l) => new Path(f).getName -> l }.toMap
    fresh.flatMap { base =>
      val p = new Path(dir, base)
      // a gen-listed file missing from the listing is loss — keep the
      // loud getFileStatus error path rather than silently skipping
      val len = lens.getOrElse(base, fs.getFileStatus(p).getLen)
      if (len <= splitSize) Seq(GlInputPartition(p.toString, 0L,
        Long.MaxValue))
      else (0L until len by splitSize).map(o =>
        GlInputPartition(p.toString, o, math.min(o + splitSize, len)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GlReaderFactory(required, pushed, None, None,
      new SerializableConfiguration(conf), nullFillMissing)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One scan task: the byte range [start, end) of `file`. (0,
  * Long.MaxValue) = the whole file. */
private[sources] case class GlInputPartition(file: String,
    start: Long = 0L, end: Long = Long.MaxValue)
    extends InputPartition

/** A metadata-only COUNT(*) answer: the whole scan is this one
  * partition, whose reader emits a single pre-aggregated row with the
  * manifest row total — no data file is ever opened. */
case class GlStatsCountPartition(rows: Long, nFuncs: Int)
    extends InputPartition

/** A split of an identity-partitioned table: carries its partition
  * VALUE so Spark can group splits by key and plan storage-partitioned
  * joins ([[org.apache.spark.sql.connector.read.HasPartitionKey]]). */
private[sources] case class GlKeyedPartition(file: String,
    start: Long, end: Long, key: InternalRow)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

private[sources] case class GlReaderFactory(required: StructType,
    pushed: Array[Filter], limit: Option[Int], aggSpec: Option[GlAggSpec],
    conf: SerializableConfiguration, nullFillMissing: Boolean = false)
    extends PartitionReaderFactory {
  private def range(p: InputPartition): (String, Long, Long) = p match {
    case g: GlInputPartition => (g.file, g.start, g.end)
    case k: GlKeyedPartition => (k.file, k.start, k.end)
    case other => throw new IllegalStateException(other.getClass.getName)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    p match {
      case c: GlStatsCountPartition =>
        return new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean =
            if (done) false else { done = true; true }
          override def get(): InternalRow =
            new GenericInternalRow(
              Array.fill[Any](c.nFuncs)(java.lang.Long.valueOf(c.rows)))
          override def close(): Unit = ()
        }
      case _ => ()
    }
    val (file, start, end) = range(p)
    aggSpec match {
      case Some(spec) => new GlAggReader(file, required, spec, pushed,
        conf.value, nullFillMissing, start, end)
      case None => new GlReader(file, required, pushed, limit, conf.value,
        nullFillMissing, start, end)
    }
  }

  /** Ordinary scans hand Spark [[org.apache.spark.sql.vectorized.ColumnarBatch]]es
    * instead of one row at a time: downstream operators read straight
    * out of column vectors inside whole-stage codegen (the scan shows
    * up under a `ColumnarToRow` that is itself codegen'd) and the
    * per-row iterator virtual-call tax disappears. Aggregate-pushdown
    * scans stay row-based — they emit one pre-aggregated row per
    * group, where batching buys nothing. */
  override def supportColumnarReads(p: InputPartition): Boolean =
    aggSpec.isEmpty && !p.isInstanceOf[GlStatsCountPartition]

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = {
    require(aggSpec.isEmpty, "columnar read not offered for agg scans")
    val (file, start, end) = range(p)
    new GlColumnarReader(file, required, pushed, limit, conf.value,
      nullFillMissing = nullFillMissing, start = start, end = end)
  }
}

/** Columnar reader: wraps the row reader's parse/filter/prune logic
  * and packs its output into reusable [[OnHeapColumnVector]]s,
  * `batchSize` rows per [[ColumnarBatch]]. Parsing stays row-wise (the
  * format is line-oriented — a text format cannot skip column bytes
  * the way parquet column chunks can, which is exactly the documented
  * reason a production format would be a columnar container); the win
  * is downstream: one virtual call per BATCH instead of per row, and
  * vector-at-a-time access for Spark's codegen'd consumers. */
private[sources] class GlColumnarReader(file: String, required: StructType,
    pushed: Array[Filter], limit: Option[Int],
    conf: org.apache.hadoop.conf.Configuration, batchSize: Int = 4096,
    nullFillMissing: Boolean = false,
    start: Long = 0L, end: Long = Long.MaxValue)
    extends PartitionReader[ColumnarBatch] {

  private val inner = new GlReader(file, required, pushed, limit, conf,
    nullFillMissing, start, end)
  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, required)
  private val batch = new ColumnarBatch(
    vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])
  private val types: Array[DataType] = required.fields.map(_.dataType)

  override def next(): Boolean = {
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    while (n < batchSize && inner.next()) {
      val row = inner.get()
      var j = 0
      while (j < types.length) {
        if (row.isNullAt(j)) vectors(j).putNull(n)
        else types(j) match {
          case IntegerType | DateType => vectors(j).putInt(n, row.getInt(j))
          case LongType | TimestampType =>
            vectors(j).putLong(n, row.getLong(j))
          case DoubleType => vectors(j).putDouble(n, row.getDouble(j))
          case BooleanType => vectors(j).putBoolean(n, row.getBoolean(j))
          case StringType =>
            val b = row.getUTF8String(j).getBytes
            vectors(j).putByteArray(n, b, 0, b.length)
          case other => throw new IllegalStateException(other.toString)
        }
        j += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = { inner.close(); batch.close() }
}

/** Row-based file reader: parses only required ∪ filter-referenced
  * columns, applies pushed filters BEFORE building the output row. Each
  * file's own header is the authority for its column order (files from
  * different writes may legally order columns differently).
  *
  * `[start, end)` is the task's byte range for block-split files (the
  * whole file when `(0, Long.MaxValue)`). Ownership is the classic
  * text-split rule: this reader emits exactly the data lines whose
  * FIRST byte lies in the range. A non-zero start seeks to `start - 1`
  * and discards one line — if `start` sat mid-line that consumes the
  * partial tail (the line belongs to the range containing its first
  * byte), and if `start` sat exactly on a line boundary it consumes
  * just the preceding newline — then reads lines, following the last
  * owned line across `end` to its newline. The header line is read
  * through a separate short stream for non-zero starts (every split
  * needs the column order; the range walk never re-reads it).
  *
  * `nullFillMissing` is the schema-evolution switch: when the read
  * comes through the CATALOG (whose `_graft_schema` is authoritative
  * and whose ALTER TABLE appends nullable columns), a column absent
  * from this file's header is a column added AFTER the file was
  * written — every row reads NULL for it, matching what a rewrite
  * would have produced. Path-based reads keep the loud
  * missing-column error: without a catalog schema there is no way to
  * distinguish evolution from a typo'd directory mix, and silence
  * there would hide real corruption. */
private[sources] class GlReader(file: String, required: StructType,
    pushed: Array[Filter], limit: Option[Int],
    conf: org.apache.hadoop.conf.Configuration,
    nullFillMissing: Boolean = false,
    start: Long = 0L, end: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {

  private val path = new Path(file)
  private val fs = path.getFileSystem(conf)
  private val in = fs.open(path)

  /** Constructor code after `fs.open` that can throw (seek, header
    * parse, schema validation) must close the stream on the way out —
    * Spark never calls close() on a reader whose constructor threw,
    * so without this each failed task attempt leaks a handle. */
  private def failClosing[T](body: => T): T =
    try body catch {
      case t: Throwable =>
        try in.close() catch { case _: Exception => () }
        throw t
    }

  private val lineText = new org.apache.hadoop.io.Text()
  // pos = byte offset of the next unread line's first byte
  private var pos = 0L
  private val lr = failClosing {
    if (start <= 0L) new org.apache.hadoop.util.LineReader(in)
    else {
      in.seek(start - 1)
      val r = new org.apache.hadoop.util.LineReader(in)
      pos = start - 1 + r.readLine(lineText)
      r
    }
  }

  private val fileSchema = failClosing {
    if (start <= 0L) {
      val n = lr.readLine(lineText)
      require(n > 0, s"graftlines: empty header in $file")
      pos = n.toLong
      GraftLines.parseHeader(lineText.toString, file)
    } else {
      // the header always lives at byte 0 — outside this range
      val hin = fs.open(path)
      val hbr = new BufferedReader(new InputStreamReader(hin, UTF_8))
      try GraftLines.parseHeader(hbr.readLine(), file) finally hbr.close()
    }
  }
  private val filterRefs: Set[String] =
    pushed.flatMap(GlFilters.references).toSet
  private val needed: Set[String] =
    required.fieldNames.toSet ++ filterRefs

  // per file-column: parse it at all? (pruning = skipping conversion)
  private val parseCol: Array[Boolean] =
    fileSchema.fields.map(f => needed.contains(f.name))
  private val fileTypes: Array[DataType] = fileSchema.fields.map(_.dataType)
  private val colPos: Map[String, Int] =
    fileSchema.fieldNames.zipWithIndex.toMap

  // loud contract: every needed column must exist with the asked type —
  // unless the catalog vouched for evolution (missing column reads
  // uniformly NULL, position -1 below) or it is the synthetic `_file`
  // metadata column every reader can produce
  failClosing {
    needed.foreach { n =>
      colPos.get(n) match {
        case None if n == GraftLines.FileCol => ()
        case None if nullFillMissing => ()
        case None => throw new IllegalArgumentException(
          s"graftlines: column '$n' missing from $file")
        case Some(i) =>
          required.fields.find(_.name == n).foreach { rf =>
            require(rf.dataType == fileTypes(i),
              s"graftlines: column '$n' is ${fileTypes(i).catalogString} in "
                + s"$file, query expects ${rf.dataType.catalogString}")
          }
      }
    }
  }

  private val requiredPos: Array[Int] =
    required.fieldNames.map(colPos.getOrElse(_, -1))
  private val requiredIsString: Array[Boolean] =
    required.fields.map(_.dataType == StringType)
  private val requiredIsFileCol: Array[Boolean] =
    required.fieldNames.map(_ == GraftLines.FileCol)
  private val fileColValue = UTF8String.fromString(file)
  private val getter: String => Any = { // for filter eval
    val pos = filterRefs.iterator.map(n => n -> colPos.getOrElse(n, -1)).toMap
    n => { val i = pos(n); if (i < 0) null else parsed(i) }
  }

  private var parsed: Array[Any] = _
  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false // per-partition early stop
    var line = readOwnedLine()
    while (line != null) {
      // limit -1: a trailing empty-string field must survive the split;
      // escapes guarantee tab/newline exactness
      val cells = line.split("\t", -1)
      require(cells.length == fileTypes.length,
        s"graftlines: row with ${cells.length} cells, "
          + s"header has ${fileTypes.length} ($file)")
      parsed = new Array[Any](fileTypes.length)
      var i = 0
      while (i < cells.length) {
        if (parseCol(i)) parsed(i) = GraftLines.parseCell(cells(i), fileTypes(i))
        i += 1
      }
      if (pushed.forall(GlFilters.eval(_, getter))) {
        val out = new Array[Any](requiredPos.length)
        var j = 0
        while (j < requiredPos.length) {
          if (requiredIsFileCol(j)) out(j) = fileColValue
          else {
            val v = if (requiredPos(j) < 0) null else parsed(requiredPos(j))
            out(j) = if (v != null && requiredIsString(j))
              UTF8String.fromString(v.asInstanceOf[String]) else v
          }
          j += 1
        }
        current = new GenericInternalRow(out)
        emitted += 1
        return true
      }
      line = readOwnedLine()
    }
    false
  }

  /** Next line whose first byte this range owns, or null at range/file
    * end. The byte count comes from the Hadoop LineReader (UTF-8 safe);
    * a line straddling `end` is still read to its newline. */
  private def readOwnedLine(): String = {
    if (pos >= end) return null
    val n = lr.readLine(lineText)
    if (n == 0) return null
    pos += n
    lineText.toString
  }

  override def get(): InternalRow = current
  private var closed = false
  override def close(): Unit = if (!closed) { closed = true; lr.close() }
}

/** Partial-aggregation reader: streams the file through the ordinary
  * row reader (pushed filters apply BEFORE aggregation, matching
  * aggregate-after-filter semantics) and hash-aggregates into
  * per-group states, emitting one row per group at end-of-file. For a
  * global aggregate (no group columns) exactly one partial row is
  * emitted even for an empty partition, so a final COUNT over an empty
  * table is 0, never null. */
private[sources] class GlAggReader(file: String, tableSchema: StructType,
    spec: GlAggSpec, pushed: Array[Filter],
    conf: org.apache.hadoop.conf.Configuration,
    nullFillMissing: Boolean = false,
    start: Long = 0L, end: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {

  private val inputCols: Seq[String] =
    (spec.groupCols ++ spec.funcs.flatMap(_.col)).distinct
  private val inputSchema = StructType(inputCols.map(n =>
    tableSchema.fields.find(_.name == n).getOrElse(throw
      new IllegalArgumentException(
        s"graftlines: aggregated column '$n' missing from table schema"))))
  private val inner = new GlReader(file, inputSchema, pushed, None, conf,
    nullFillMissing, start, end)

  private val pos: Map[String, Int] = inputCols.zipWithIndex.toMap
  private val groupIdx: Array[Int] = spec.groupCols.map(pos).toArray
  private val funcIdx: Array[Int] =
    spec.funcs.map(f => f.col.map(pos).getOrElse(-1)).toArray
  private val types: Array[DataType] = inputSchema.fields.map(_.dataType)

  private def value(row: InternalRow, i: Int): Any =
    if (row.isNullAt(i)) null
    else types(i) match {
      case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
      case LongType | TimestampType => java.lang.Long.valueOf(row.getLong(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case StringType => row.getUTF8String(i)
      case other => throw new IllegalStateException(other.toString)
    }

  /** Spark's min/max ordering for the types we accept: ints/longs
    * natural, doubles via Double.compare (NaN greatest — same as
    * Spark's Ordering[Double]). Strings never reach here (declined at
    * pushAggregation). */
  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Integer, y: java.lang.Integer) => x < y
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.compare(x, y) < 0
    case _ => throw new IllegalStateException(s"unorderable: $a / $b")
  }

  // r16 hot loop (guide §1.2 step 2 — per-task work): the fold runs
  // once per ROW of the file, so per-row allocations dominate the agg
  // scan (measured 2.0 s vs 0.36 s for the plain row scan of the same
  // file before this change). Fixes, values unchanged:
  //  - counts live in a primitive long array instead of re-boxing a
  //    java.lang.Long per row per count function;
  //  - `count` null-tests via row.isNullAt instead of boxing the cell;
  //  - the single-group-column case (the common pushed shape) keys the
  //    map on the raw cell value instead of allocating a one-element
  //    Seq wrapper per row (Scala's ## / == make nulls and UTF8String
  //    keys behave identically to the Seq form).
  // r17 (VERDICT r16 #3 — the residual 1.25 s vs 0.36 s plain-scan gap):
  //  - min/max over the integer-backed types (int/long/date/timestamp)
  //    fold through primitive long slots (opcodes 8/9) instead of the
  //    boxed generic path — no per-row boxing, no pattern-matched lt;
  //  - the single-STRING-group shape (every pushed demo groups on a
  //    flag/brand/source column) probes an insertion-ordered array by
  //    linear UTF8String.equals scan (a memcmp) instead of paying map
  //    hashing machinery per row; past LINEAR_MAX observed groups —
  //    where a linear scan would lose to hashing — the store migrates
  //    itself (insertion order preserved) into the LinkedHashMap that
  //    every other shape uses. Output order and values are unchanged
  //    in all cases: first-observation order either way.
  private lazy val groups: Iterator[InternalRow] = {
    // per-func state: cnt for counts; min/max in primitive double/long
    // slots chosen by type once (allocation-free per row), with the
    // boxed generic slot mm kept as the fallback for any other
    // orderable type a future pushAggregation might admit
    final class GState(val cnt: Array[Long], val mm: Array[Any],
      val dbl: Array[Double], val lng: Array[Long], val seen: Array[Boolean])
    val nf = spec.funcs.length
    // opcodes: 0 countstar, 1 count, 2 min, 3 max (validated at push);
    // +4 = double-specialized min/max, +6 = long-backed min/max
    val ops: Array[Int] = spec.funcs.zipWithIndex.map { case (f, j) =>
      val base = f.kind match {
        case "countstar" => 0
        case "count" => 1
        case "min" => 2
        case "max" => 3
        case other => throw new IllegalStateException(other)
      }
      if (base >= 2) types(funcIdx(j)) match {
        case DoubleType => base + 4
        case IntegerType | DateType | LongType | TimestampType => base + 6
        case _ => base
      } else base
    }.toArray
    // long-backed min/max slots box back to the column's external type
    val intWidth: Array[Boolean] = spec.funcs.indices.map { j =>
      funcIdx(j) >= 0 && (types(funcIdx(j)) match {
        case IntegerType | DateType => true
        case _ => false
      })
    }.toArray
    val single = groupIdx.length == 1
    val singleStr = single && types(groupIdx(0)) == StringType
    val m = scala.collection.mutable.LinkedHashMap[Any, GState]()
    def fresh() = new GState(new Array[Long](nf), new Array[Any](nf),
      new Array[Double](nf), new Array[Long](nf), new Array[Boolean](nf))
    // linear store for the single-string-group shape
    val LINEAR_MAX = 64
    var linKeys: Array[UTF8String] = null
    var linStates: Array[GState] = null
    var linN = 0
    var useLin = singleStr
    if (useLin) {
      linKeys = new Array[UTF8String](LINEAR_MAX)
      linStates = new Array[GState](LINEAR_MAX)
    }
    def linLookup(k: UTF8String): GState = {
      var i = 0
      while (i < linN) {
        val ki = linKeys(i)
        if (if (k == null) ki == null else k.equals(ki)) return linStates(i)
        i += 1
      }
      if (linN == LINEAR_MAX) {
        // migrate, preserving first-observation order, then fall back
        var j = 0
        while (j < linN) { m.update(linKeys(j), linStates(j)); j += 1 }
        useLin = false
        return m.getOrElseUpdate(k, fresh())
      }
      val st = fresh()
      linKeys(linN) = k; linStates(linN) = st; linN += 1
      st
    }
    while (inner.next()) {
      val row = inner.get()
      val st =
        if (useLin) linLookup(
          if (row.isNullAt(groupIdx(0))) null else row.getUTF8String(groupIdx(0)))
        else {
          val key: Any =
            if (single) value(row, groupIdx(0))
            else groupIdx.map(value(row, _)).toSeq
          m.getOrElseUpdate(key, fresh())
        }
      var j = 0
      while (j < nf) {
        ops(j) match {
          case 0 => st.cnt(j) += 1
          case 1 => if (!row.isNullAt(funcIdx(j))) st.cnt(j) += 1
          case 2 =>
            val v = value(row, funcIdx(j))
            if (v != null && (st.mm(j) == null || lt(v, st.mm(j))))
              st.mm(j) = v
          case 3 =>
            val v = value(row, funcIdx(j))
            if (v != null && (st.mm(j) == null || lt(st.mm(j), v)))
              st.mm(j) = v
          case 6 => // min(double) — Double.compare, NaN greatest (= lt)
            if (!row.isNullAt(funcIdx(j))) {
              val v = row.getDouble(funcIdx(j))
              if (!st.seen(j) || java.lang.Double.compare(v, st.dbl(j)) < 0) {
                st.dbl(j) = v; st.seen(j) = true
              }
            }
          case 7 => // max(double)
            if (!row.isNullAt(funcIdx(j))) {
              val v = row.getDouble(funcIdx(j))
              if (!st.seen(j) || java.lang.Double.compare(st.dbl(j), v) < 0) {
                st.dbl(j) = v; st.seen(j) = true
              }
            }
          case 8 => // min(int/long/date/timestamp) — natural long order
            if (!row.isNullAt(funcIdx(j))) {
              val v = if (intWidth(j)) row.getInt(funcIdx(j)).toLong
                      else row.getLong(funcIdx(j))
              if (!st.seen(j) || v < st.lng(j)) {
                st.lng(j) = v; st.seen(j) = true
              }
            }
          case 9 => // max(int/long/date/timestamp)
            if (!row.isNullAt(funcIdx(j))) {
              val v = if (intWidth(j)) row.getInt(funcIdx(j)).toLong
                      else row.getLong(funcIdx(j))
              if (!st.seen(j) || v > st.lng(j)) {
                st.lng(j) = v; st.seen(j) = true
              }
            }
        }
        j += 1
      }
    }
    inner.close()
    if (linN == 0 && m.isEmpty && spec.groupCols.isEmpty)
      m.update(Seq.empty, fresh())
    def emit(k: Any, st: GState): InternalRow = {
      val ks: Seq[Any] =
        if (single) Seq(k) else k.asInstanceOf[Seq[Any]]
      val vs: Seq[Any] = (0 until nf).map { j =>
        ops(j) match {
          case 0 | 1 => java.lang.Long.valueOf(st.cnt(j))
          case 2 | 3 => st.mm(j)
          case 6 | 7 =>
            if (st.seen(j)) java.lang.Double.valueOf(st.dbl(j)) else null
          case _ =>
            if (!st.seen(j)) null
            else if (intWidth(j)) java.lang.Integer.valueOf(st.lng(j).toInt)
            else java.lang.Long.valueOf(st.lng(j))
        }
      }
      new GenericInternalRow((ks ++ vs).toArray[Any])
    }
    // useLin still true ⇒ every state lives in the lin arrays (m can
    // only be non-empty here via the global-agg empty-file row, whose
    // shape never enters the lin path). useLin false ⇒ everything is
    // in m — including any migrated lin entries, in their original
    // first-observation order.
    if (useLin)
      (0 until linN).iterator.map(i => emit(linKeys(i), linStates(i))) ++
        m.iterator.map((emit _).tupled)
    else m.iterator.map((emit _).tupled)
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (groups.hasNext) { current = groups.next(); true } else false
  override def get(): InternalRow = current
  // the aggregation loop closes `inner` when it drains the file, but a
  // task cancelled BEFORE the first next() never forces the lazy
  // `groups` — closing here (idempotent in GlReader) covers that path
  // instead of leaking the input stream until GC
  override def close(): Unit = inner.close()
}

private[sources] class GlWriteBuilder(path: String, schema: StructType,
    clusterBy: Option[String] = None, clusterParts: Option[Int] = None,
    partitionCol: Option[String] = None,
    bucketSpec: Option[(String, Int)] = None,
    queryId: String = "")
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new GlWrite(path, schema, doTruncate,
    clusterBy, clusterParts, partitionCol, bucketSpec, queryId)
}

/** Staged-rename commit protocol: tasks never land bytes under a
  * reader-visible name. Each task writer streams to a staging name
  * (`.part-….gl.staging` — the `.gl` listing never sees it) and the
  * JOB commit renames every staged file to its final `.gl` name in one
  * driver-side metadata loop, then writes the stats manifest. Until
  * commit, readers see the directory exactly as the previous job left
  * it — including under `mode("overwrite")`, whose deletion of the old
  * files now happens at commit time, not before the tasks launch. A
  * failed/aborted job leaves only staging debris that no reader lists
  * and the next overwrite clears. The residual window is the rename
  * loop itself (O(files) driver-side renames, same exposure as
  * Hadoop's FileOutputCommitter) — honest limit: per-file rename is
  * atomic, the loop across files is not, and a multi-writer race on
  * one directory still needs a catalog on top. */
private[sources] class GlWrite(path: String, schema: StructType,
    truncate: Boolean, clusterBy: Option[String] = None,
    clusterParts: Option[Int] = None,
    partitionCol: Option[String] = None,
    bucketSpec: Option[(String, Int)] = None,
    /** LogicalWriteInfo.queryId — the streaming query's STABLE id
      * (same across restarts from one checkpoint), the idempotence
      * scope of the epoch ledger. Batch writes never use it. */
    queryId: String = "")
    extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  // validate the schema is storable BEFORE launching tasks
  GraftLines.header(schema)

  /** Write-time clustering ([[RequiresDistributionAndOrdering]]):
    * with `.option("clusterBy", col)` the connector asks SPARK to
    * range-partition and sort the incoming rows on that column before
    * they reach the task writers — the engine plans the exchange, the
    * source only declares the requirement (the DSv2-native cousin of
    * q_etl_zorder's hand-rolled repartitionByRange). Every file then
    * covers a tight, DISJOINT key range, which is exactly what makes
    * the `_graft_stats` min/max manifest prune sharply: a point or
    * range predicate later touches one file instead of all of them.
    * Without the option both methods return "unspecified" and the
    * write plans exactly as before. */
  private def clusterSort: Array[
      org.apache.spark.sql.connector.expressions.SortOrder] =
    clusterBy.map { c =>
      Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions.identity(c),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    }.getOrElse(Array.empty)

  override def requiredDistribution():
      org.apache.spark.sql.connector.distributions.Distribution =
    if (bucketSpec.nonEmpty)
      // bucket partitioning: co-locate each bucket in one task; the
      // transform resolves through GraftCatalog's FunctionCatalog
      org.apache.spark.sql.connector.distributions.Distributions.clustered(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .bucket(bucketSpec.get._2, bucketSpec.get._1)))
    else if (partitionCol.nonEmpty)
      // identity partitioning: co-locate equal values so a partition
      // value lands in ONE task -> one file per value table-wide
      org.apache.spark.sql.connector.distributions.Distributions.clustered(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity(partitionCol.get)))
    else if (clusterBy.isEmpty)
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    else
      org.apache.spark.sql.connector.distributions.Distributions
        .ordered(clusterSort)

  override def requiredOrdering(): Array[
      org.apache.spark.sql.connector.expressions.SortOrder] = clusterSort

  /** Pinned file count for clustered writes (0 = engine decides). */
  override def requiredNumPartitions(): Int =
    if (clusterBy.isEmpty) 0 else clusterParts.getOrElse(0)

  override def toBatch: BatchWrite = this

  /** Streaming sink (`writeStream.format("graftlines")`): append-only —
    * Complete mode would truncate the table every epoch, which on a
    * versioned table means a full rewrite per micro-batch; reject it
    * loudly and keep the sink's semantics one thing (append). */
  override def toStreaming: StreamingWrite = {
    require(!truncate,
      "graftlines: streaming supports Append output mode only — " +
        "Complete/Update would truncate the table every micro-batch")
    new GlStreamingWrite(path, schema, queryId)
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    (partitionCol, bucketSpec) match {
      case (Some(c), _) =>
        GlPartitionedWriterFactory(path, schema,
          schema.fieldIndex(c), new SerializableConfiguration(conf))
      case (_, Some((c, n))) =>
        GlBucketedWriterFactory(path, schema,
          schema.fieldIndex(c), n, new SerializableConfiguration(conf))
      case _ =>
        GlWriterFactory(path, schema, new SerializableConfiguration(conf))
    }
  }

  /** Publishes the job: under truncate, deletes the files the old
    * generation left (data + stats — deferred from factory creation so
    * concurrent readers keep a complete view until here), then renames
    * every staged task file to its final name. A rename failure fails
    * the job loudly — a missing data file is loss, unlike stats.
    * Afterwards the `_graft_stats` manifest is assembled from the
    * per-task stats riding the commit messages — the driver writes one
    * small index file; no task output is re-read. Appends merge with
    * the existing manifest (its lines for files this write replaced
    * are harmless: skipping only consults lines whose file is listed).
    * Manifest write failures are swallowed — stats are an optimization
    * and must never fail a committed write. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val dirFs = new Path(path).getFileSystem(conf)
    // partitioned tasks report one GlCommitted per per-value file
    val msgs: Array[GlCommitted] = messages.flatMap {
      case m: GlMultiCommitted => m.msgs
      case c: GlCommitted => Seq(c)
      case _ => Nil
    }
    // publishing a partitioned write makes the table partitioned for
    // every later writer/reader (idempotent; conflicting column fails)
    partitionCol.foreach(GraftLines.writePartitionCol(path, _, conf))
    val staged = msgs.collect {
      case GlCommitted(Some(s), Some(f), _) => (new Path(s), new Path(f))
    }
    if (GraftLines.isVersioned(path, conf)) {
      commitVersioned(conf, dirFs, staged, msgs)
      return
    }
    if (truncate) {
      GraftLines.listDataFiles(path, conf)
        .foreach(f => dirFs.delete(new Path(f), false))
      dirFs.delete(GraftLines.statsPath(path), false) // stale stats must die
      // staging debris from jobs that died without abort() is garbage;
      // this job's own staged files (about to be renamed) are exempt —
      // matched by base name, which is task-unique within the directory
      // (full-path compare would trip on fs-scheme qualification)
      val ours = staged.map(_._1.getName).toSet
      dirFs.listStatus(new Path(path)).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".staging")
          && !ours.contains(st.getPath.getName))
        .foreach(st => dirFs.delete(st.getPath, false))
    }
    staged.foreach { case (s, f) =>
      // append mode may legally re-use a final name an older job left
      // (same partition/task ids): replace, matching the previous
      // create-overwrite semantics
      if (dirFs.exists(f)) dirFs.delete(f, false)
      require(dirFs.rename(s, f),
        s"graftlines: commit failed renaming $s -> $f")
    }
    val newLines = msgs.flatMap {
      case GlCommitted(_, Some(f), lines) =>
        val base = new Path(f).getName
        lines.map(l => s"$base\t$l")
      case _ => Nil
    }
    if (newLines.isEmpty) return
    // a re-used task file name replaces its old bytes, so its old
    // manifest lines must not survive beside the new ones
    GraftLines.mergeStats(path, conf,
      dropNames = newLines.map(_.takeWhile(_ != '\t')).toSet,
      newLines = newLines, replaceAll = truncate)
  }

  /** Versioned publish: deletes NOTHING. Staged files land under
    * generation-suffixed names (`…-g<N>.gl` — unique forever, so a
    * later commit can never rewrite a committed version's bytes in
    * place), the new generation manifest lists carried-over files
    * (append: the previous generation; overwrite: none) plus this
    * job's, and old generations stay byte-for-byte readable until
    * [[GraftLines.expireVersions]]. Stats lines for superseded files
    * also survive — older versions still prune with them, and pruning
    * only ever consults lines for files the resolved generation
    * plans. */
  private def commitVersioned(conf: org.apache.hadoop.conf.Configuration,
      dirFs: org.apache.hadoop.fs.FileSystem,
      staged: Seq[(Path, Path)],
      messages: Array[GlCommitted]): Unit = {
    val gens = GraftLines.genVersions(path, conf)
    val next = gens.lastOption.getOrElse(0) + 1
    // pre-versioning data files (a marker added to an existing
    // path-based dir): adopted into the first generation on append
    val preExisting: Seq[String] =
      if (gens.nonEmpty || truncate) Nil
      else GraftLines.listDataFiles(path, conf).map(new Path(_).getName)
    def vname(f: Path): Path = new Path(f.getParent,
      f.getName.stripSuffix(GraftLines.Ext) + s"-g$next${GraftLines.Ext}")
    val fmap: Map[String, String] =
      staged.map { case (_, f) => f.getName -> vname(f).getName }.toMap
    staged.foreach { case (s, f) =>
      val tgt = vname(f)
      require(!dirFs.exists(tgt),
        s"graftlines: versioned commit target $tgt already exists — " +
          "concurrent committers race on the generation number; " +
          "serialize writers through the catalog")
      require(dirFs.rename(s, tgt),
        s"graftlines: versioned commit failed renaming $s -> $tgt")
    }
    val newBases = staged.map { case (_, f) => fmap(f.getName) }
    val carried: Seq[String] =
      if (truncate) Nil
      else gens.lastOption.map(GraftLines.readGen(path, _, conf))
        .getOrElse(preExisting)
    GraftLines.writeGen(path, next, carried ++ newBases, conf)
    val newLines = messages.flatMap {
      case GlCommitted(_, Some(f), lines) =>
        val base = fmap(new Path(f).getName)
        lines.map(l => s"$base\t$l")
      case _ => Nil
    }
    if (newLines.nonEmpty)
      GraftLines.mergeStats(path, conf, dropNames = Set.empty,
        newLines = newLines)
  }

  /** Nothing was renamed (commit never ran), so aborting = deleting
    * staging files; the reader-visible directory was never touched. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    messages.flatMap {
      case m: GlMultiCommitted => m.msgs
      case c: GlCommitted => Seq(c)
      case _ => Nil
    }.collect { case GlCommitted(Some(st), _, _) =>
      fs.delete(new Path(st), false)
    }
  }
}

/** Exactly-once streaming sink (`writeStream.format("graftlines")`,
  * Append mode): per-epoch task writers stage exactly like batch, and
  * the epoch commit publishes with epoch-keyed idempotence — the
  * property Structured Streaming demands, because after a failure the
  * engine replays the last micro-batch and calls commit for an epoch
  * that may already be durable.
  *
  *  - **Versioned table**: each epoch commit is a new GENERATION whose
  *    manifest carries a `#epoch:<E>` tag; the single atomic manifest
  *    rename is both the data publish and the idempotence ledger (no
  *    separate log whose lag could double-commit). A replayed epoch is
  *    detected via [[GraftLines.committedEpochs]] and its bytes are
  *    dropped. Streaming INTO a versioned table composes with the
  *    micro-batch SOURCE over the same table: each sunk epoch streams
  *    back out as exactly one generation-diff batch.
  *  - **Plain directory**: final names carry the epoch (`-e<E>-`), and
  *    a commit first clears any files of ITS OWN epoch (a crashed or
  *    replayed attempt — other epochs can never match the tag), then
  *    renames. Replace-per-epoch is the overwrite-by-batchId
  *    idempotence foreachBatch users hand-roll, native in the sink.
  *
  * Honest limits: a crashed versioned attempt can orphan
  * generation-suffixed bytes that no manifest references (the vacuum /
  * expireVersions sweeps already reclaim exactly that), and Complete /
  * Update output modes are rejected up front ([[GlWrite.toStreaming]]). */
private[sources] class GlStreamingWrite(path: String, schema: StructType,
    rawQueryId: String = "")
    extends StreamingWrite {
  /** Tag-safe identity of the owning streaming query: part of the
    * idempotence key (epoch numbers are per query — see
    * [[GraftLines.committedEpochs]]) and of plain-directory file
    * names (so one query's replace-per-epoch cannot sweep another's
    * same-numbered files). */
  private val queryId = GraftLines.queryTag(rawQueryId)
  GraftLines.header(schema) // reject unstorable schemas before tasks launch

  // Incremental committed-epoch ledger: a generation manifest's
  // #epoch tag is immutable once its publish rename lands, so each
  // commit only has to read manifests NEWER than the last scan.
  // Without the cache a long-running stream into a versioned table
  // pays O(generations) driver file opens per micro-batch — quadratic
  // over the stream's life. Epoch commits are sequential per query,
  // so plain vars suffice; a fresh GlStreamingWrite after recovery
  // starts cold and rebuilds the set from all manifests once.
  private var scannedThroughGen = 0
  private val knownEpochs =
    scala.collection.mutable.Set.empty[(Long, String)]

  /** Returns (committed epochs, current generation list) — the gens
    * list rides along so the commit path pays ONE directory listing
    * per epoch, not one here and another for the next-gen number. */
  private def committedEpochsIncremental(
      conf: org.apache.hadoop.conf.Configuration)
      : (collection.Set[(Long, String)], Seq[Int]) = {
    val gens = GraftLines.genVersions(path, conf)
    gens.iterator.filter(_ > scannedThroughGen).foreach { n =>
      GraftLines.epochOfGen(path, n, conf).foreach(knownEpochs += _)
    }
    scannedThroughGen = gens.foldLeft(scannedThroughGen)(math.max)
    (knownEpochs, gens)
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    dir.getFileSystem(conf).mkdirs(dir)
    GlStreamingWriterFactory(path, schema,
      new SerializableConfiguration(conf), queryId)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val staged = messages.collect {
      case GlCommitted(Some(s), Some(f), _) => (new Path(s), new Path(f))
    }.toSeq
    if (GraftLines.isVersioned(path, conf))
      commitVersionedEpoch(epochId, messages, staged, conf, fs)
    else commitPlainEpoch(epochId, messages, staged, conf, fs)
  }

  private def commitVersionedEpoch(epochId: Long,
      messages: Array[WriterCommitMessage], staged: Seq[(Path, Path)],
      conf: org.apache.hadoop.conf.Configuration,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val (committed, gens) = committedEpochsIncremental(conf)
    if (committed.contains((epochId, queryId))
        || committed.contains((epochId, ""))) {
      // replayed epoch after recovery: already durable — drop the
      // replay's bytes, keep the committed manifest untouched
      staged.foreach { case (s, _) => fs.delete(s, false) }
      return
    }
    val next = gens.lastOption.getOrElse(0) + 1
    def vname(f: Path): Path = new Path(f.getParent,
      f.getName.stripSuffix(GraftLines.Ext) + s"-g$next${GraftLines.Ext}")
    val fmap: Map[String, String] =
      staged.map { case (_, f) => f.getName -> vname(f).getName }.toMap
    staged.foreach { case (s, f) =>
      val tgt = vname(f)
      // a target left by a CRASHED attempt of this same epoch is
      // unreferenced (its manifest never published) — replace it;
      // epoch-tagged names cannot collide across committed epochs
      if (fs.exists(tgt)) fs.delete(tgt, false)
      require(fs.rename(s, tgt),
        s"graftlines: streaming commit failed renaming $s -> $tgt")
    }
    val carried =
      gens.lastOption.map(GraftLines.readGen(path, _, conf)).getOrElse(Nil)
    GraftLines.writeGen(path, next,
      carried ++ staged.map { case (_, f) => fmap(f.getName) }, conf,
      epoch = Some((epochId, queryId)))
    // record our own publish in the ledger cache so the next commit's
    // incremental scan doesn't re-open the manifest just written
    knownEpochs += ((epochId, queryId))
    scannedThroughGen = math.max(scannedThroughGen, next)
    val newLines = messages.flatMap {
      case GlCommitted(_, Some(f), lines) =>
        val base = fmap(new Path(f).getName)
        lines.map(l => s"$base\t$l")
      case _ => Nil
    }
    if (newLines.nonEmpty)
      GraftLines.mergeStats(path, conf,
        dropNames = newLines.map(_.takeWhile(_ != '\t')).toSet,
        newLines = newLines.toSeq)
  }

  private def commitPlainEpoch(epochId: Long,
      messages: Array[WriterCommitMessage], staged: Seq[(Path, Path)],
      conf: org.apache.hadoop.conf.Configuration,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    // the sweep keys on (query, epoch): a replacement query's epoch 0
    // must never delete the previous query's epoch-0 files. Legacy
    // names (pre-query-tag builds) no longer match and linger as
    // orphan debris rather than risk cross-query deletion.
    val tag = s"-q$queryId-e$epochId-"
    val stale = GraftLines.listDataFiles(path, conf)
      .filter(f => new Path(f).getName.contains(tag))
    stale.foreach(f => fs.delete(new Path(f), false))
    staged.foreach { case (s, f) =>
      if (fs.exists(f)) fs.delete(f, false)
      require(fs.rename(s, f),
        s"graftlines: streaming commit failed renaming $s -> $f")
    }
    val newLines = messages.flatMap {
      case GlCommitted(_, Some(f), lines) =>
        val base = new Path(f).getName
        lines.map(l => s"$base\t$l")
      case _ => Nil
    }
    val drop = stale.map(new Path(_).getName).toSet ++
      newLines.map(_.takeWhile(_ != '\t'))
    if (drop.nonEmpty || newLines.nonEmpty)
      GraftLines.mergeStats(path, conf, dropNames = drop,
        newLines = newLines.toSeq)
  }

  /** Nothing was renamed; only staging bytes exist — delete them. */
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    messages.collect { case GlCommitted(Some(s), _, _) =>
      fs.delete(new Path(s), false)
    }
  }
}

/** Epoch rides the final name (`part-<pid>-e<E>-<task>.gl`): on a plain
  * directory that makes replace-per-epoch possible; on a versioned one
  * it keeps crashed-attempt targets collision-free across epochs. */
private[sources] case class GlStreamingWriterFactory(path: String,
    schema: StructType, conf: SerializableConfiguration,
    queryId: String = "adhoc")
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GlWriter(path, schema, partitionId, taskId, conf.value,
      nameOverride = Some(
        f"part-$partitionId%05d-q$queryId-e$epochId-$taskId${GraftLines.Ext}"))
}

/** `staged`: the task's staging path (written bytes); `file`: the
  * final name the job commit renames it to. `statsLines`: per-column
  * manifest payloads for the task's file (`rows \t col \t nulls \t
  * min \t max`, cell text encoding) — the final base name is prefixed
  * by the job commit. */
private[sources] case class GlCommitted(staged: Option[String],
    file: Option[String], statsLines: Seq[String] = Nil)
    extends WriterCommitMessage

/** A partitioned task's commit: one [[GlCommitted]] per per-value file
  * it wrote. The job commit flattens these into the ordinary path. */
private[sources] case class GlMultiCommitted(msgs: Seq[GlCommitted])
    extends WriterCommitMessage

private[sources] case class GlPartitionedWriterFactory(path: String,
    schema: StructType, partIdx: Int, conf: SerializableConfiguration,
    jobTag: String = GraftLines.newJobTag())
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GlPartitionedWriter(path, schema, partitionId, taskId, conf.value,
      partIdx, jobTag)
}

private[sources] case class GlBucketedWriterFactory(path: String,
    schema: StructType, colIdx: Int, numBuckets: Int,
    conf: SerializableConfiguration,
    jobTag: String = GraftLines.newJobTag()) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GlBucketedWriter(path, schema, partitionId, taskId, conf.value,
      colIdx, numBuckets, jobTag)
}

/** Bucket-partitioned task writer: routes each row to the
  * [[GlWriter]] for its bucket id (the shared
  * [[GraftLines.bucketOf]] — identical to the FunctionCatalog-published
  * form the planner resolves), landing files named `…-b<id>.gl` so the
  * scan recovers every file's bucket without opening it. The engine
  * already clustered rows by the bucket transform, so a task usually
  * owns whole buckets. */
private[sources] class GlBucketedWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long,
    conf: org.apache.hadoop.conf.Configuration, colIdx: Int, numBuckets: Int,
    jobTag: String)
    extends DataWriter[InternalRow] {

  private val colType = schema.fields(colIdx).dataType
  private val writers =
    scala.collection.mutable.LinkedHashMap.empty[Int, GlWriter]

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(colIdx),
      s"graftlines: NULL bucket value in column " +
        s"'${schema.fields(colIdx).name}' — bucket partitioning " +
        "requires non-null keys")
    val v: Long = colType match {
      case LongType => row.getLong(colIdx)
      case IntegerType => row.getInt(colIdx).toLong
      case other => throw new IllegalStateException(
        s"unsupported bucket column type $other")
    }
    val b = GraftLines.bucketOf(v, numBuckets)
    // jobTag BEFORE -b<id>: BucketNamePattern anchors on the suffix
    writers.getOrElseUpdate(b, new GlWriter(dir, schema, partitionId, taskId,
      conf, nameOverride = Some(
        f"part-$partitionId%05d-$taskId-$jobTag-b$b${GraftLines.Ext}")))
      .write(row)
  }

  override def commit(): WriterCommitMessage =
    GlMultiCommitted(writers.values
      .map(_.commit().asInstanceOf[GlCommitted]).toSeq)
  override def abort(): Unit = writers.values.foreach(_.abort())
  override def close(): Unit = writers.values.foreach(_.close())
}

/** Identity-partitioned task writer: routes each row to the
  * [[GlWriter]] for its partition value, so every landed file holds
  * exactly ONE value — the invariant the scan recovers from stats
  * (min == max) to report KeyGroupedPartitioning. The engine already
  * clustered rows by the column (GlWrite.requiredDistribution), so a
  * task usually owns whole values and the per-task writer map stays
  * value-count bounded; per-task file names carry a dense index
  * (`-p<k>`), not the value (values need no name-escaping that way). */
private[sources] class GlPartitionedWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long,
    conf: org.apache.hadoop.conf.Configuration, partIdx: Int,
    jobTag: String)
    extends DataWriter[InternalRow] {

  private val partType = schema.fields(partIdx).dataType
  private val writers =
    scala.collection.mutable.LinkedHashMap.empty[Any, GlWriter]

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(partIdx),
      s"graftlines: NULL partition value in column " +
        s"'${schema.fields(partIdx).name}' — identity partitioning " +
        "requires non-null values (stats cannot recover a NULL)")
    val v: Any = partType match {
      case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(partIdx))
      case LongType | TimestampType => java.lang.Long.valueOf(row.getLong(partIdx))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(partIdx))
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(partIdx))
      case other => throw new IllegalStateException(
        s"unsupported partition type $other")
    }
    writers.getOrElseUpdate(v, new GlWriter(dir, schema, partitionId, taskId,
      conf, nameOverride = Some(
        f"part-$partitionId%05d-$taskId-$jobTag" +
          f"-p${writers.size}${GraftLines.Ext}")))
      .write(row)
  }

  override def commit(): WriterCommitMessage =
    GlMultiCommitted(writers.values
      .map(_.commit().asInstanceOf[GlCommitted]).toSeq)
  override def abort(): Unit = writers.values.foreach(_.abort())
  override def close(): Unit = writers.values.foreach(_.close())
}

/** Replacement rows from a group-based rewrite arrive with Spark's
  * leading `__row_operation` INT column when the operation declares no
  * metadata attributes — the plain DataWritingSparkTask applies no
  * projection (only the metadata variant does, verified against
  * Spark 4.1's ReplaceDataExec.writingTask). This factory strips it
  * with Spark's own [[ProjectingInternalRow]] over ordinals 1..n, and
  * insists the operation code is WRITE_OPERATION — any other code is a
  * delta-write row shape this group-based connector must never
  * reinterpret silently. Rows already matching the table arity pass
  * through untouched, so a future Spark that projects for us keeps
  * working. */
private[sources] case class GlOpStrippingFactory(inner: DataWriterFactory,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val d = inner.createWriter(partitionId, taskId)
    new DataWriter[InternalRow] {
      private val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
        schema, (1 to schema.length).toIndexedSeq)
      override def write(row: InternalRow): Unit =
        if (row.numFields == schema.length + 1) {
          val code = row.getInt(0)
          // group-based rewrites tag whole replacement rows WRITE (5)
          // or WRITE_WITH_METADATA (6); per-row delta codes
          // (DELETE/UPDATE/INSERT 1-3) are a delta-write shape this
          // group-based connector must never reinterpret silently
          require(code ==
            org.apache.spark.sql.catalyst.util.RowDeltaUtils.WRITE_OPERATION
            || code == org.apache.spark.sql.catalyst.util.RowDeltaUtils
              .WRITE_WITH_METADATA_OPERATION,
            s"graftlines: unexpected row operation code $code " +
              "in group-based replace write")
          proj.project(row)
          d.write(proj)
        } else d.write(row)
      override def commit(): WriterCommitMessage = d.commit()
      override def abort(): Unit = d.abort()
      override def close(): Unit = d.close()
    }
  }
}

private[sources] case class GlWriterFactory(path: String, schema: StructType,
    conf: SerializableConfiguration,
    // evaluated ONCE per factory construction on the driver, then
    // serialized to every task — all of a job's files share the tag
    jobTag: String = GraftLines.newJobTag()) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GlWriter(path, schema, partitionId, taskId, conf.value,
      nameOverride = Some(
        f"part-$partitionId%05d-$taskId-$jobTag${GraftLines.Ext}"))
}

/** Task-side writer: lazily creates the STAGING file
  * `.part-<pid>-<taskId>.gl.staging` on first row (empty partitions
  * land no file); the job commit renames it to its final
  * `part-<pid>-<taskId>.gl` name. The dot-prefix + suffix keep it out
  * of every data listing, so a task is invisible to readers until the
  * whole job publishes. Task-unique names keep concurrent speculative
  * attempts from colliding (attempt id is folded into taskId by
  * Spark; only the winning attempt's message reaches the job commit). */
private[sources] class GlWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long,
    conf: org.apache.hadoop.conf.Configuration,
    nameOverride: Option[String] = None)
    extends DataWriter[InternalRow] {

  private val finalName = nameOverride.getOrElse(
    f"part-$partitionId%05d-$taskId${GraftLines.Ext}")
  private val file = new Path(dir, s".$finalName.staging")
  private var out: OutputStreamWriter = _
  private val types = schema.fields.map(_.dataType)

  // Per-column stats for the `_graft_stats` manifest, accumulated as
  // rows stream through (no second pass, no task-output re-read) —
  // see [[GlStatsAcc]], shared with the refreshStats back-fill so the
  // line shapes cannot drift between the two producers.
  private val acc = new GlStatsAcc(schema)

  private def ensureOpen(): Unit = if (out == null) {
    out = new OutputStreamWriter(
      file.getFileSystem(conf).create(file, true), UTF_8)
    out.write(GraftLines.header(schema))
    out.write('\n')
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append('\t')
      if (row.isNullAt(i)) sb.append("\\N")
      else types(i) match {
        case IntegerType | DateType => sb.append(row.getInt(i))
        case LongType | TimestampType => sb.append(row.getLong(i))
        case DoubleType => sb.append(row.getDouble(i)) // shortest repr round-trips
        case BooleanType => sb.append(row.getBoolean(i))
        case StringType =>
          sb.append(GraftLines.escape(row.getUTF8String(i).toString))
        case other => throw new IllegalStateException(other.toString)
      }
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
    acc.add(row)
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    if (out == null) GlCommitted(None, None)
    else {
      // byte length of the finished staging file — the publish is a
      // rename, so this IS the final file's length. It rides its own
      // `#len` stats line as the staleness cross-check consumers of
      // EXACT row counts require (see [[GraftLines.StatsLenMarker]]).
      val byteLen = file.getFileSystem(conf).getFileStatus(file).getLen
      GlCommitted(Some(file.toString),
        Some(new Path(dir, finalName).toString), acc.lines(byteLen))
    }
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); file.getFileSystem(conf).delete(file, false) }
  }

  override def close(): Unit = ()
}

/** Streaming per-file stats accumulator — the ONE producer of
  * `_graft_stats` line shapes, shared by the write path ([[GlWriter]],
  * lines ride the commit message) and [[GraftLines.refreshStats]]
  * (which recounts existing files so manifests written before the
  * `#len` cross-check regain the exact-count fast path). Keeping both
  * producers on one implementation means the formats cannot drift.
  *
  *  - (nulls, min, max) for stats-eligible columns only — the same
  *    type set whose pushed-filter comparisons the reader evaluates,
  *    so a recorded min/max is always safe to prune with.
  *  - String columns get a per-file Bloom filter instead of min/max
  *    (ordering is the UTF-16/UTF8 hazard; membership has no order):
  *    k probes per non-null value, one hex cell. Fixed 1 KiB per
  *    (file, column).
  */
private[sources] class GlStatsAcc(schema: StructType) {
  private val types = schema.fields.map(_.dataType)
  private val statsCols: Array[Int] =
    types.indices.filter(i => GraftLines.statsEligible(types(i))).toArray
  private var rowCount = 0L
  private val nullCounts = new Array[Long](types.length)
  private val mins = new Array[Any](types.length)
  private val maxs = new Array[Any](types.length)
  private val bloomCols: Array[Int] =
    types.indices.filter(types(_) == StringType).toArray
  private val blooms: Array[Array[Long]] =
    bloomCols.map(_ => new Array[Long](GlBloom.NumLongs))

  /** Same orderings GlFilters.cmp / GlAggReader use: ints/longs
    * natural, doubles via Double.compare (NaN greatest — matches
    * Spark; a NaN-polluted max only widens the kept range because
    * NaN literals are never pushed), booleans false < true. */
  private def less(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Integer, y: java.lang.Integer) => x < y
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.compare(x, y) < 0
    case (x: java.lang.Boolean, y: java.lang.Boolean) => !x && y
    case _ => throw new IllegalStateException(s"unorderable: $a / $b")
  }

  def add(row: InternalRow): Unit = {
    rowCount += 1
    var s = 0
    while (s < statsCols.length) {
      val c = statsCols(s)
      if (row.isNullAt(c)) nullCounts(c) += 1
      else {
        val v: Any = types(c) match {
          case IntegerType => java.lang.Integer.valueOf(row.getInt(c))
          case LongType => java.lang.Long.valueOf(row.getLong(c))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(c))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(c))
          case other => throw new IllegalStateException(other.toString)
        }
        if (mins(c) == null || less(v, mins(c))) mins(c) = v
        if (maxs(c) == null || less(maxs(c), v)) maxs(c) = v
      }
      s += 1
    }
    var b = 0
    while (b < bloomCols.length) {
      val c = bloomCols(b)
      if (row.isNullAt(c)) nullCounts(c) += 1
      else GlBloom.add(blooms(b), row.getUTF8String(c).toString)
      b += 1
    }
  }

  /** Stats lines for the accumulated rows, WITHOUT the leading
    * baseName field (the committer prefixes it): the `#len` length
    * cross-check line first, then min/max lines, then Bloom lines. */
  def lines(byteLen: Long): Seq[String] = {
    val lenLine = s"$rowCount\t${GraftLines.StatsLenMarker}\t0" +
      s"\t$byteLen\t-\t${GraftLines.StatsSentinel}"
    Seq(lenLine) ++ statsCols.toSeq.map { c =>
      val mn = if (mins(c) == null) "\\N" else mins(c).toString
      val mx = if (maxs(c) == null) "\\N" else maxs(c).toString
      s"$rowCount\t${schema.fields(c).name}\t${nullCounts(c)}\t$mn\t$mx" +
        s"\t${GraftLines.StatsSentinel}"
    } ++ bloomCols.toSeq.zipWithIndex.map { case (c, b) =>
      s"$rowCount\t${schema.fields(c).name}\t${nullCounts(c)}" +
        s"\t${GlBloom.Marker}\t${GlBloom.encode(blooms(b))}" +
        s"\t${GraftLines.StatsSentinel}"
    }
  }
}

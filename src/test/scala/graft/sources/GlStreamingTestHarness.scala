package graft.sources

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Test-only driver for [[GlStreamingWrite]]: plays one epoch's task
  * write + epoch commit by hand, so GlStreamSinkSpec can exercise the
  * replay/crash paths (double-commit, crashed-attempt replacement)
  * that a healthy StreamExecution never takes. Task ids advance per
  * call, exactly as a restarted engine's would. */
object GlStreamingTestHarness {
  /** Test-visible bridges to package-private manifest readers. */
  def genVersions(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[Int] =
    GraftLines.genVersions(dir, conf)
  def committedEpochs(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Set[Long] =
    GraftLines.committedEpochs(dir, conf).map(_._1)
  /** Process-wide `#epoch:` manifest-open counter (monotonic). */
  def epochTagReads: Long = GlMetrics.epochTagReads.get()
}

class GlStreamingTestHarness(path: String, schema: StructType) {
  private var task = 0L
  // ONE StreamingWrite per harness, as per query run in the engine —
  // so a same-harness epoch sequence exercises the warm incremental
  // committed-epoch cache; a FRESH harness plays the recovery path
  // (cold cache rebuilt from all generation manifests).
  private val w = new GlStreamingWrite(path, schema)

  def writeEpoch(epoch: Long, rows: Seq[(Long, String)]): Unit = {
    val f = w.createStreamingWriterFactory(null)
    task += 1
    val dw = f.createWriter(0, task, epoch)
    rows.foreach { case (k, s) =>
      dw.write(new GenericInternalRow(
        Array[Any](k, UTF8String.fromString(s))))
    }
    val msg = dw.commit()
    w.commit(epoch, Array(msg))
  }
}

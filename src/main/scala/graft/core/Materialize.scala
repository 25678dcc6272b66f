package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Dataset

/** The engine's ONE materialization primitive for multi-consumer frames
  * (shared dedup signatures, Lloyd-round centroids, CC round frames,
  * prefix-sum blocks): every operator that needs a subtree computed
  * exactly once routes through `materializeOnce` instead of calling
  * `localCheckpoint` directly, so the local-vs-cluster storage decision
  * lives in one place.
  *
  * - `local[*]` (the test/bench harness): `localCheckpoint` — blocks in
  *   executor memory+disk of the single JVM, the cheapest exactly-once
  *   materialization there is. Its known failure mode — checkpointed
  *   partitions die with their executor and are UNRECOVERABLE because
  *   the lineage was truncated — cannot happen with one executor that
  *   IS the driver.
  * - cluster: reliable `checkpoint` — writes the blocks to the
  *   checkpoint directory (HDFS/object store on a real fleet), so
  *   losing an executor (guaranteed at 1000-executor sizes) re-reads
  *   from reliable storage instead of failing the job, and the lineage
  *   is truncated exactly as in local mode.
  *
  * `persist(DISK_ONLY)` ALONE was evaluated and REJECTED for the
  * cluster mode: persist retains lineage, and most of these pins sit
  * inside iterative loops (CC rounds, BPE merge rounds, Lloyd rounds,
  * the recursive prefix sum), where retained lineage nests every prior
  * round's plan inside the next. Measured on this suite, the nested
  * plans made AQE's plan maintenance alone run for >30 minutes at
  * sf0.001 — lineage truncation is load-bearing for the iterative
  * operators, not an optimization. The cluster path instead uses the
  * persist-THEN-checkpoint idiom: a transient DISK_ONLY cache feeds the
  * checkpoint-write job (avoiding the bare checkpoint's double
  * computation of the subtree), then is dropped; lineage still
  * truncates at the checkpoint.
  *
  * `spark.graft.materialize` (`localCheckpoint` | `checkpoint`)
  * overrides the master-based default in either direction — the spec
  * suite runs the operator set in forced-checkpoint mode to prove the
  * cluster path computes identical results through the same code.
  *
  * `eager` mirrors `localCheckpoint`'s parameter (materialize now vs at
  * first action). The reliable-checkpoint mode ignores it and always
  * materializes eagerly — see the leak note at the persist site.
  */
object Materialize {

  private[core] val ConfKey = "spark.graft.materialize"

  def once[T](ds: Dataset[T], eager: Boolean = false): Dataset[T] = {
    val spark = ds.sparkSession
    val sc = spark.sparkContext
    val mode = spark.conf.getOption(ConfKey).getOrElse(
      if (sc.isLocal) "localCheckpoint" else "checkpoint")
    mode match {
      case "localCheckpoint" => ds.localCheckpoint(eager)
      case "checkpoint" =>
        if (sc.getCheckpointDir.isEmpty) {
          // a cluster deployment must point this at reliable shared
          // storage; defaulting silently to an executor-local path
          // would reintroduce the failure mode this switch removes
          require(sc.isLocal,
            "spark.graft.materialize=checkpoint needs " +
              "SparkContext.setCheckpointDir on reliable shared storage")
          val tmp = Files.createTempDirectory("graft-ckpt")
          sc.setCheckpointDir(tmp.toString)
          // local fallback dirs are ours to reclaim (cluster deployments
          // manage their shared checkpoint root themselves)
          Runtime.getRuntime.addShutdownHook(new Thread(() =>
            try org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
            catch { case _: Throwable => () }))
        }
        // persist-then-checkpoint: a bare reliable checkpoint computes the
        // subtree TWICE (once for the triggering action, once more in the
        // checkpoint-write job that re-runs the lineage). Caching first
        // makes the write job read the just-computed blocks instead.
        //
        // The checkpoint path is ALWAYS eager, ignoring the flag: the
        // transient cache can only be dropped once the checkpoint holds
        // the blocks, and a lazy pin has no hook for that moment —
        // Dataset.persist registers the plan in the session CacheManager,
        // which holds a strong reference for the session lifetime, so
        // the reference-tracking ContextCleaner (which only reclaims
        // UNREACHABLE RDDs) would never collect it and every lazy pin
        // would leak its DISK_ONLY blocks and a CacheManager entry
        // forever in a long-lived cluster session. Every pin in this
        // engine is consumed by an action immediately after
        // construction, so eager materialization only moves that work
        // earlier; plan-construction laziness (for audit/report tooling
        // that builds plans without executing) is preserved in the
        // localCheckpoint mode those tools run under.
        val cached = ds.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val pinned = cached.checkpoint(eager = true)
        cached.unpersist(blocking = false)
        pinned
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be 'localCheckpoint' or 'checkpoint', got '$other'")
    }
  }

  /** `.materializeOnce()` postfix form so operator bodies keep their
    * builder-chain shape.
    */
  implicit final class MatOps[T](private val ds: Dataset[T]) extends AnyVal {
    def materializeOnce(eager: Boolean = false): Dataset[T] = once(ds, eager)
  }
}

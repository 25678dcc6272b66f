package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

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
  * - cluster: `persist(DISK_ONLY)` — same exactly-once compute on the
  *   happy path, but the lineage is RETAINED, so losing an executor
  *   (guaranteed at 1000-executor fleet sizes) recomputes the lost
  *   blocks instead of failing the job. DISK_ONLY because these frames
  *   back multi-stage fan-outs: memory-tier persists get evicted under
  *   shuffle pressure exactly when several consumers are about to read
  *   them.
  *
  * `spark.graft.materialize` (`localCheckpoint` | `persist`) overrides
  * the master-based default in either direction — the spec suite runs
  * the operator set in forced-persist mode to prove the cluster path
  * computes identical results.
  *
  * `eager` mirrors `localCheckpoint`'s parameter (materialize now vs at
  * first action). Persist is inherently lazy; eagerness there would add
  * an action for no correctness gain, so it is accepted and ignored.
  */
object Materialize {

  private[core] val ConfKey = "spark.graft.materialize"

  def once[T](ds: Dataset[T], eager: Boolean = false): Dataset[T] = {
    val spark = ds.sparkSession
    val mode = spark.conf.getOption(ConfKey).getOrElse(
      if (spark.sparkContext.isLocal) "localCheckpoint" else "persist")
    mode match {
      case "persist" => ds.persist(StorageLevel.DISK_ONLY)
      case "localCheckpoint" => ds.localCheckpoint(eager)
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be 'localCheckpoint' or 'persist', got '$other'")
    }
  }

  /** `.materializeOnce()` postfix form so operator bodies keep their
    * builder-chain shape.
    */
  implicit final class MatOps[T](private val ds: Dataset[T]) extends AnyVal {
    def materializeOnce(eager: Boolean = false): Dataset[T] = once(ds, eager)
  }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the shapes AQE cannot fix.
  *
  * AQE's skew-join splitting only helps sort-merge joins whose skewed
  * partitions it can subdivide AFTER the shuffle; when the build side
  * must replicate (e.g. a medium dim too big to broadcast joined to a
  * fact with a hot key), the classic fix is key salting: the fact side
  * scatters each key over `salt` synthetic sub-keys, the dim side
  * replicates each row `salt` times, and the join runs on
  * (key, salt_id) — the hot key's rows now spread over `salt`
  * partitions instead of one straggler task. Replication cost is
  * O(|dim| · salt) narrow rows, bounded and chosen by the caller.
  */
object Skew {

  /** Equi-join `fact` to `dim` on `key`, salting the key so one hot
    * value cannot serialize into a single task. Semantically identical
    * to `fact.join(dim, key)` (inner); physically the fact side gets a
    * uniform pseudo-random salt derived from its row content and the
    * dim side replicates across all salt values.
    *
    * @param salt number of sub-keys per key — size it to the observed
    *             hot-key multiplicity over the mean (8-64 typical)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    // fact: deterministic uniform salt from the whole row (content-derived,
    // so retries/replays salt identically — no rand(), which would break
    // task-retry determinism)
    val factCols: Array[Column] = fact.columns.map(col)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols: _*), lit(salt)).cast("int"))
    // dim: replicate every row across the salt space via a generator —
    // a map-side fan-out, no join and no shuffle
    val replicated = dim.withColumn("__salt",
      explode(lit((0 until salt).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

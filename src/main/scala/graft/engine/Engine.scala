package graft.engine

import org.apache.spark.sql.SparkSession

/** One-time session preparation: nanos-as-long parquet reading, graft's
  * native function registration, and the sargable-timestamp optimizer rule.
  *
  * The driver CONSTRUCTS the SparkSession (the contract hands
  * `SparkEntry.queries` a ready session), so there is no builder hook to
  * attach `SparkSessionExtensions` to — session preparation has to happen on
  * first use instead. It lives here, explicitly, rather than as a hidden
  * side effect sprinkled through readers; [[Tables.table]] calls it, and
  * library users with their own sessions can call it directly. Guarded
  * per-session (weak refs — sessions are never pinned), so repeated reads
  * never re-mutate shared state.
  */
object Engine {

  private val initialized = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def ensureInitialized(spark: SparkSession): Unit = synchronized {
    if (!initialized.contains(spark)) {
      // events.parquet stores TIMESTAMP(NANOS), unrepresentable in Spark's
      // µs TimestampType; read as raw int64 nanos (Tables.events derives µs).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE coalescing floor 1m → 64k (r15, guide §2.5): this engine's hot
      // operators are CPU-DENSE PER BYTE (shingle md5/minhash folds, banded
      // DP, VecDot) — a few MB of shuffle carries seconds of compute, and
      // the byte-based floor was measured squeezing such stages to 1-5
      // tasks on a 32-core box. With parallelismFirst=true (default) the
      // coalescing target is max(totalBytes/parallelism, THIS floor), so at
      // cluster scale — where totalBytes/parallelism ≫ 64k — the setting is
      // inert; it only stops the degenerate small-shuffle case from
      // serializing compute-bound stages. Interleaved same-box A/B
      // (OPTIMIZATION_r15.md): wins 10-20% steady on the minhash family and
      // removes multi-second steady spikes, PROVIDED spark.buffer.pageSize
      // is not left to auto-scale with a large heap (the Bench/TimeQ
      // builders pin it; see there). Results are partition-count-invariant
      // by construction (bitwise invariance gate). Env-overridable.
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      graft.functions.GraftFunctions.register(spark)
      if (!spark.experimental.extraOptimizations.contains(graft.plans.SargableTimestampRules))
        spark.experimental.extraOptimizations ++= Seq(graft.plans.SargableTimestampRules)
      initialized.add(spark)
    }
  }
}

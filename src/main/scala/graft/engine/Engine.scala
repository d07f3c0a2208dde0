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

  /** The AQE-floor decision, pure so the pairing contract is testable:
    * Some(floor) only when the session pinned `spark.buffer.pageSize` at or
    * below 4m (the in-repo builders pin 1m) or the operator set the env
    * override — never for a session with auto-derived task pages. */
  private[graft] def aqeFloorFor(pageSize: Option[String],
      envOverride: Option[String]): Option[String] = {
    val pagePinnedSmall = pageSize.exists(p =>
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(p) <= 4L * 1024 * 1024)
    if (envOverride.isDefined) envOverride
    else if (pagePinnedSmall) Some("64k")
    else None
  }

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
      // is not left to auto-scale with a large heap — the r15 A/B measured
      // the floor ALONE making the minhash family 3-4× WORSE under a 16g
      // heap (32 concurrent tiny-partition sort tasks each preallocating
      // ~16m auto-derived task pages). r16 (verdict "what's wrong" #1):
      // the floor therefore engages ONLY when the session pinned
      // spark.buffer.pageSize to a small value (≤ 4m — the in-repo
      // builders pin 1m), i.e. the two knobs now live or die TOGETHER; a
      // session without the page pin (an external consumer, a bare spark-
      // shell) keeps Spark's default floor and can never inherit the
      // measured floor-without-pages pathology. The env override remains
      // unconditional — an operator setting SPARK_GRAFT_MIN_PARTITION_SIZE
      // is stating the pairing explicitly. Results are partition-count-
      // invariant by construction (bitwise invariance gate).
      aqeFloorFor(
        spark.sparkContext.getConf.getOption("spark.buffer.pageSize"),
        sys.env.get("SPARK_GRAFT_MIN_PARTITION_SIZE")).foreach(
        spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", _))
      // Let AQE rewrite sort-merge joins to shuffled-hash at runtime when
      // every post-shuffle build partition fits under this bound (r16,
      // guide §3.1 — default 0 disables the rewrite entirely). The cap's
      // semi-join filter (capShingleDfQuantile) is the motivating case:
      // with a small survivor set AQE broadcasts it, with a large one this
      // rewrite gives a hash join — and without it the planner's SMJ
      // re-sorts the full exploded shingle stream (sf10 A/B: the shared
      // calibrated build 14.0 s hash vs 16.9 s sort-merge, q118 89 s
      // broadcast vs 103 s when a hint pinned shuffle-hash and blocked the
      // broadcast). 64m bounds per-task build memory (× cores = well under
      // any sane executor heap); env-overridable.
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "64m"))
      graft.functions.GraftFunctions.register(spark)
      if (!spark.experimental.extraOptimizations.contains(graft.plans.SargableTimestampRules))
        spark.experimental.extraOptimizations ++= Seq(graft.plans.SargableTimestampRules)
      initialized.add(spark)
    }
  }
}

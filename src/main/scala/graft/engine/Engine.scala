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
      graft.functions.GraftFunctions.register(spark)
      if (!spark.experimental.extraOptimizations.contains(graft.plans.SargableTimestampRules))
        spark.experimental.extraOptimizations ++= Seq(graft.plans.SargableTimestampRules)
      initialized.add(spark)
    }
  }
}

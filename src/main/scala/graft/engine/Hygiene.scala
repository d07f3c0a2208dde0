package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Session-state hygiene for long-lived drivers.
  *
  * A single long-lived SparkSession that executes hundreds of queries (a
  * benchmark pass, a query service, a 100 TB pipeline driver) accumulates
  * state the queries themselves never see: `localCheckpoint` RDD blocks
  * (freed only when the ContextCleaner notices the RDD object was GC'd —
  * which under a large, mostly-idle heap can lag by HOURS), CacheManager
  * entries, broadcast blocks, and shuffle files. Round 6's bench measured
  * the cost: composite queries ran 6–50× slower mid-session than in a
  * fresh session, purely from this accumulation. The fix is twofold:
  * operators release superseded iteration state eagerly (see
  * [[graft.operators.GraphOps.connectedComponents]]'s sliding-window
  * release), and session drivers call [[sweep]] between queries.
  */
object Hygiene {

  /** RDDs [[sweep]] must never unpersist: session-scoped shared
    * materializations ([[Shared]]) that later queries will re-read.
    * (A localCheckpointed RDD is UNRECOMPUTABLE once its blocks drop —
    * lineage was truncated — so sweeping a still-referenced one would
    * fail the next reader, not slow it.)
    *
    * Keyed by (applicationId, rddId), not the bare integer id: the set is
    * JVM-global, and a SparkContext that stops without [[Shared.clear]]
    * would otherwise leave stale small-integer pins that silently exempt
    * UNRELATED fresh RDDs of the next context in the same JVM (fresh
    * contexts reuse small ids) — re-opening the leak sweep exists to fix.
    * Entries of dead applications can never match a live sweep's key; they
    * cost a few bytes each until JVM exit. */
  private val pinned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()

  def pin(rdds: Iterable[RDD[_]]): Unit =
    rdds.foreach(r => pinned.add((r.sparkContext.applicationId, r.id)))
  def unpin(rdds: Iterable[RDD[_]]): Unit =
    rdds.foreach(r => pinned.remove((r.sparkContext.applicationId, r.id)))

  /** The RDDs physically backing `df`'s plan — the `LogicalRDD` leaves a
    * `localCheckpoint`/`checkpoint` rewrote the plan to. Empty for a plan
    * that was never checkpointed. */
  def backingRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  /** Free the block-manager blocks behind a checkpointed DataFrame the
    * caller has finished consuming. After this the DataFrame must not be
    * used again (its lineage is truncated; the blocks were its only
    * materialization). Safe on never-materialized lazy checkpoints and on
    * non-checkpointed plans (no-op). */
  def release(df: DataFrame): Unit =
    backingRdds(df).foreach(_.unpersist(blocking = false))

  /** Between-query state reset for a long-lived session. Unpersists every
    * persistent RDD not [[pin]]ned (localCheckpoint leftovers included),
    * clears the CacheManager, and — when `gc` — runs a full GC plus a
    * short pause so the ContextCleaner drains its reference queue
    * (broadcast and shuffle cleanup ride on GC noticing dead references;
    * an idle 128 GiB heap may otherwise not collect for the whole run).
    * Call it OUTSIDE any timed window, and never concurrently with a
    * running query (it would unpersist mid-flight iteration state). */
  def sweep(spark: SparkSession, gc: Boolean = false): Unit = {
    spark.catalog.clearCache()
    val app = spark.sparkContext.applicationId
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinned.contains((app, id))) rdd.unpersist(blocking = false)
    }
    if (gc) {
      System.gc()
      // The ContextCleaner's keepCleaning thread polls a ReferenceQueue the
      // GC just populated; give it one beat to issue the unpersist/remove
      // RPCs before the next query starts allocating.
      Thread.sleep(50L)
    }
  }
}

/** Session-scoped shared materializations: deterministic intermediates
  * several queries rebuild identically (the minhash candidate-pair list
  * feeding q53/q101/q111, the semantic near-dup clusters feeding q61/q110)
  * are computed ONCE per (application, key) and served from an eager
  * localCheckpoint. Each query's RESULT is unchanged — only the shared
  * prefix's recomputation is elided — so oracle semantics are untouched.
  * Entries are pinned against [[Hygiene.sweep]]; [[Shared.clear]] drops
  * and frees them (end of session, or tests). */
object Shared {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** The shared materialization for `key`, building it from `build` on
    * first use. The build is materialized eagerly (localCheckpoint) so
    * every consumer — including the first — reads blocks, not a live plan
    * whose lineage would re-run per consumer. Keyed by applicationId so a
    * new SparkContext in the same JVM never reads a dead context's blocks.
    *
    * The build runs OUTSIDE any map lock: an eager localCheckpoint is a
    * full Spark job (potentially minutes for a CC prefix), and running it
    * inside `computeIfAbsent` would hold the bin lock for the duration —
    * blocking unrelated keys on the same stripe and deadlocking a build
    * that re-enters the map. Two racing threads may both build; the
    * publish is `putIfAbsent` and the loser releases its duplicate. */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (spark.sparkContext.applicationId, key)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val out = build.localCheckpoint(eager = true)
      Hygiene.pin(Hygiene.backingRdds(out))
      val prior = cache.putIfAbsent(k, out)
      if (prior == null) out
      else {
        Hygiene.unpin(Hygiene.backingRdds(out))
        Hygiene.release(out)
        prior
      }
    }
  }

  private val valueCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]()

  /** [[cached]] for small DRIVER-side artifacts that are not DataFrames —
    * a trained [[graft.operators.SimilarityOps.AnnIndex]], a fitted config
    * tuple: values whose whole point is to be computed once per session
    * (training is the expensive step) and then consulted cheaply. Same
    * build-outside-the-lock / publish-with-putIfAbsent discipline as
    * [[cached]]; the loser's duplicate needs no release (plain JVM value,
    * no pinned blocks). Keyed by applicationId like the DataFrame cache so
    * a value derived from one context's data is never served to another. */
  def cachedValue[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val k = (spark.sparkContext.applicationId, key)
    val hit = valueCache.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val out = build
      val prior = valueCache.putIfAbsent(k, out)
      if (prior == null) out else prior.asInstanceOf[T]
    }
  }

  /** Drop and free every shared entry of this application. */
  def clear(spark: SparkSession): Unit = {
    val app = spark.sparkContext.applicationId
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == app) {
        Hygiene.unpin(Hygiene.backingRdds(e.getValue))
        Hygiene.release(e.getValue)
        it.remove()
      }
    }
    val vit = valueCache.entrySet().iterator()
    while (vit.hasNext) {
      if (vit.next().getKey._1 == app) vit.remove()
    }
  }
}

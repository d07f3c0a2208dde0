package graft

import graft.engine.Engine

/** The r16 knob-pairing contract (r15 verdict "what's wrong" #1): the 64k
  * AQE coalescing floor and the 1m task-page pin were measured to only be
  * safe TOGETHER (floor alone under auto-derived ~16m pages made the minhash
  * family 3-4× worse), so Engine must arm the floor only for sessions that
  * pinned the pages small — or when the operator states the pairing
  * explicitly via the env override.
  */
class EngineConfSpec extends SparkSpec {

  test("floor engages only when pageSize is pinned small") {
    // In-repo builders: 1m pages → paired floor.
    assert(Engine.aqeFloorFor(Some("1m"), None).contains("64k"))
    assert(Engine.aqeFloorFor(Some("4m"), None).contains("64k"))
    // Auto-derived or large pages → Spark's default floor stays.
    assert(Engine.aqeFloorFor(None, None).isEmpty)
    assert(Engine.aqeFloorFor(Some("16m"), None).isEmpty)
    // Env override is the operator stating the pairing — unconditional.
    assert(Engine.aqeFloorFor(None, Some("128k")).contains("128k"))
    assert(Engine.aqeFloorFor(Some("16m"), Some("1m")).contains("1m"))
  }

  test("unpinned session keeps Spark's default floor after init") {
    Engine.ensureInitialized(spark)
    // The shared test session pins no pageSize, so ensureInitialized must
    // NOT have lowered the coalescing floor (1m default in Spark 4).
    val floor = spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
    assert(floor != "64k",
      "engine floor leaked into a session without the page-size pin")
  }
}

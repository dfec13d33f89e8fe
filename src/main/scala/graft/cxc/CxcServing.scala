package graft.cxc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Serving layer (SURVEY §2.1 S10): the Spark mapping of the reference
  * dashboard's TTL-cached loaders
  * (/root/reference/dashboard/data_loader.py:48-114 — `@st.cache_data
  * (ttl=3600)` per view) as materialized-and-registered views refreshed
  * on schedule.
  *
  * Semantics mirrored from the reference:
  *  - a view read inside the TTL serves the cached materialization
  *    (no recompute, no re-scan);
  *  - the first read past the TTL swaps in a freshly built set;
  *  - `refresh()` is the manual invalidation hook (the dashboard's
  *    "clear cache" button).
  *
  * Scale note: "materialize" here is Spark caching + temp-view
  * registration — executors hold the report-sized views in memory
  * (MEMORY_AND_DISK, so an oversized view spills instead of OOMing).
  * The clock is injectable so TTL behavior is unit-testable.
  */
class CxcServing(
    spark: SparkSession,
    build: () => Map[String, DataFrame],
    ttlSeconds: Long = 3600L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private var current: Map[String, DataFrame] = Map.empty
  private var lastRefreshMs: Long = Long.MinValue
  private var buildCount: Int = 0

  /** Number of times the view set has been (re)built — for tests and
    * freshness monitoring.
    */
  def builds: Int = synchronized(buildCount)

  /** Materialize a fresh view set: unpersist the previous generation,
    * cache + register the new one under its view names.
    */
  def refresh(): Unit = synchronized {
    current.valuesIterator.foreach(_.unpersist(blocking = false))
    current = build().map { case (name, df) =>
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      cached.createOrReplaceTempView(name)
      name -> cached
    }
    buildCount += 1
    lastRefreshMs = clock()
  }

  private def maybeRefresh(): Unit = synchronized {
    if (lastRefreshMs == Long.MinValue || clock() - lastRefreshMs >= ttlSeconds * 1000L)
      refresh()
  }

  /** Serve one view, refreshing the whole set first if the TTL lapsed
    * (the loaders share one freshness horizon, like the dashboard's
    * per-session cache).
    */
  def view(name: String): DataFrame = synchronized {
    maybeRefresh()
    current(name)
  }

  def viewNames: Set[String] = synchronized(current.keySet)
}

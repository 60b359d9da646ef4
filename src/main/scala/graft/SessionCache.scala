package graft

import org.apache.spark.sql.SparkSession
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Per-SparkSession memo: an outer WEAK map keyed on the session object
  * (identity) holding an inner map keyed by the caller's key. A stopped
  * session can never be handed back (new session ⇒ new inner map), and
  * — unlike a strong (session, key) tuple key — the stopped session's
  * entries, plans and the session itself become collectable as soon as
  * the caller drops it. Used by every engine-level materialization
  * (tables, EDGES, shingles, LSH pairs, rankings). */
final class SessionCache[K, V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, mutable.Map[K, V]]()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V =
    synchronized {
      var inner = bySession.get(spark)
      if (inner == null) {
        inner = mutable.Map[K, V]()
        bySession.put(spark, inner)
      }
      inner.getOrElseUpdate(key, build)
    }

  def put(spark: SparkSession, key: K, value: V): Unit = synchronized {
    var inner = bySession.get(spark)
    if (inner == null) {
      inner = mutable.Map[K, V]()
      bySession.put(spark, inner)
    }
    inner(key) = value
  }

  /** All live values (for cleanup sweeps). */
  def values: Seq[V] = synchronized {
    bySession.values.asScala.flatMap(_.values).toList
  }

  def clear(): Unit = synchronized { bySession.clear() }
}

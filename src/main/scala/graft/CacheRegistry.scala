package graft

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ArrayBuffer

/** Tracks every Dataset a query definition persists so long-lived
  * sessions can release them deterministically. The persists exist for
  * plan-node reuse WITHIN one execution (q35/q36's shingle tables feed
  * self-joins, q62's test grams feed the bloom build and the verify
  * join); across executions they would only accumulate — one cached RDD
  * per (query, sf dir) — so every driver loop (Verify, Bench, QBench)
  * calls [[releaseAll]] after each query's terminal action, and library
  * users get the same hook. */
object CacheRegistry {
  private val tracked = ArrayBuffer[Dataset[_]]()

  /** Register a just-persisted Dataset; returns it for chaining. */
  def track[T](ds: Dataset[T]): Dataset[T] = synchronized {
    tracked += ds
    ds
  }

  /** Unpersist everything tracked (blocking=false; safe on dead sessions). */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { ds =>
      try ds.unpersist()
      catch { case _: Throwable => () }
    }
    tracked.clear()
  }
}

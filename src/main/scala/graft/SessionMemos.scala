package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Session-scoped memoization of deterministic, heavily-reduced DataFrames
  * (the pairs / CC-labels / scored-pairs lifecycle shared by Dedup and
  * Similarity) — with ACTUAL auto-collection on session loss.
  *
  * The round-6/7 form kept `WeakHashMap[SparkSession, TrieMap[_,
  * DataFrame]]` per owner: keyed weakly, but a cached DataFrame strongly
  * references its SparkSession (`Dataset.sparkSession`), so the value
  * resurrected the key and an entry was never collectable without explicit
  * `evictMemos` — the WeakHashMap javadoc's value-refers-to-key caveat.
  * This registry stores what a memo actually needs and nothing more: the
  * result's `(StructType, RDD[Row])`. An `RDD` references the
  * SparkContext, never the session — PROVIDED the row RDD is built without
  * re-planning: `Dataset.rdd` plans through AQE, and the resulting lineage
  * captures `AdaptiveSparkPlanExec`, whose execution context holds the
  * session (measured: such a carrier pinned its session past a 120 s GC
  * deadline). Memo builds end in `localCheckpoint()`, so their analyzed
  * plan is already the bare `LogicalRDD` leaf; the carrier maps that leaf's
  * `RDD[InternalRow]` through an `ExpressionEncoder` deserializer — both
  * session-free. When a caller drops its session the entry group becomes
  * unreachable, the weak key clears on the next GC, and Spark's
  * ContextCleaner unpersists the orphaned checkpoint blocks through its
  * own weak-reference tracking (the `spark.cleaner.referenceTracking`
  * path). A dropped session therefore frees its memos with NO explicit
  * eviction — spec'd by `MemoLifecycleSpec`. Explicit [[evict]] remains
  * for harnesses that re-measure cold paths inside one live session (the
  * bench protocol).
  *
  * Cache hits rebuild the frame with `createDataFrame(rdd, schema)` — an
  * `ExternalRDD` scan of a band-collision-bounded table, never corpus
  * mass, so consumer plan shapes are unchanged. Memo values must stay
  * final, heavily-reduced tables (label tables, pair tables) — the
  * [[Checkpoints.retain]] contract. */
object SessionMemos {

  private val caches = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, Any), (StructType, RDD[Row])]]()

  /** The memoized frame for (session, name, key), building (and caching
    * its session-free carrier) on first use. Builds serialize per session:
    * TrieMap.getOrElseUpdate is not atomic, and a racing double-build
    * would leak the loser's retained checkpoint blocks for the session's
    * lifetime. */
  def getOrBuild(spark: SparkSession, name: String, key: Any)
      (build: => DataFrame): DataFrame = {
    val perSession = caches.synchronized {
      caches.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty)
    }
    val (schema, rdd) = perSession.synchronized {
      perSession.getOrElseUpdate((name, key), carrierOf(build))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** The session-free carrier of a checkpointed build result. The build
    * contract is that the frame was `localCheckpoint()`ed (all memo builds
    * re-checkpoint onto their own blocks); a non-checkpointed frame is
    * checkpointed here so the carrier can never capture a planned (AQE)
    * lineage. */
  private def carrierOf(df: DataFrame): (StructType, RDD[Row]) = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.execution.LogicalRDD
    val ckpt = df.queryExecution.analyzed match {
      case _: LogicalRDD => df
      case _ => df.localCheckpoint()
    }
    val schema = ckpt.schema
    val internal = ckpt.queryExecution.analyzed.asInstanceOf[LogicalRDD].rdd
    val rowRdd = internal.mapPartitions { iter =>
      val deser = ExpressionEncoder(schema).resolveAndBind().createDeserializer()
      iter.map(r => deser(r))
    }
    (schema, rowRdd)
  }

  /** Drop this session's entries under the given memo names (all names
    * when empty) — the cache-map half of an explicit eviction; pair with
    * [[Checkpoints.evictSessionMemos]] to free the retained blocks. */
  def evict(spark: SparkSession, names: String*): Unit = {
    caches.synchronized {
      if (names.isEmpty) { caches.remove(spark); () }
      else Option(caches.get(spark)).foreach { m =>
        m.keys.filter(k => names.contains(k._1)).foreach(m.remove)
      }
    }
    scalars.synchronized {
      if (names.isEmpty) { scalars.remove(spark); () }
      else Option(scalars.get(spark)).foreach { m =>
        m.keys.filter(k => names.contains(k._1)).foreach(m.remove)
      }
    }
  }

  // ---- scalar memos (driver-side metadata, not DataFrames) ---------------

  private val scalars = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, Any), Any]]()

  /** Session-scoped memo for small DRIVER-SIDE metadata values whose key
    * names an IMMUTABLE-ONCE-COMMITTED filesystem object (round-16 ADVICE
    * fix, low: the composite-snapshot resolvers re-read the ledger file
    * of EVERY committed version plus the per-tag commit markers on every
    * page call — O(versions) filesystem round-trips per query on paths
    * the publish protocol guarantees are never rewritten in place: a
    * committed version dir's `_applied_tags` is written once before the
    * rename, version numbers never reuse within a lineage, and
    * generation roots embed `_g<N>`). Values must be small and derived
    * ONLY from such immutable state; anything listing-shaped (what
    * versions/tags exist NOW) stays uncached. Same lifetime as the frame
    * memos: weakly keyed by session, dropped by [[evict]]. Out-of-band
    * deletion + rebuild at the SAME path within one session (not a
    * protocol operation) is the one way to stale this cache — harnesses
    * doing that must evict first (the existing memo discipline). */
  def getOrComputeScalar[T](spark: SparkSession, name: String, key: Any)(
      compute: => T): T = {
    val perSession = scalars.synchronized {
      scalars.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty)
    }
    perSession.getOrElseUpdate((name, key), compute).asInstanceOf[T]
  }

  /** Number of sessions currently holding memo entries (stale weak keys
    * expunged first) — the MemoLifecycleSpec observation point. */
  private[graft] def liveSessionCount: Int =
    caches.synchronized { caches.size }
}

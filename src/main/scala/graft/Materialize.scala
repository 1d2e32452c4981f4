package graft

import org.apache.spark.sql.DataFrame

/** The engine-wide materialization point for derived tables that feed
  * multiple plan consumers — self-join sides (dedup signatures, LSH
  * band/bucket tables), df-cap aggregations, and the per-round label
  * tables of the iterative graph engines. Spark only reuses identical
  * subtrees when they are exchange roots, so without a cut each extra
  * consumer re-runs the whole upstream pipeline.
  *
  * Two modes, switched per-session by the runtime conf
  * [[Materialize.ReliableDirKey]] (`graft.materialize.reliable`):
  *
  *  - '''default''' (conf unset): `localCheckpoint` — the cut rows live
  *    in executor block managers. Fastest (no extra compute, no
  *    filesystem traffic), but the blocks are NOT replicated: losing an
  *    executor mid-query makes them unrecoverable and fails the job.
  *    Right for local runs and short interactive queries.
  *  - '''reliable''' (conf = a fault-tolerant directory, e.g. an HDFS /
  *    object-store path): reliable `Dataset.checkpoint` — the cut rows
  *    are written as files under the directory, so executor loss
  *    downgrades from job failure to a re-read. This is the 100 TB
  *    setting: on a 1000-executor cluster executor churn is routine,
  *    and a multi-hour dedup job must not restart because one machine
  *    was preempted. Cost: Spark writes the checkpoint by re-running
  *    the cut subtree once after the first job that computes it (the
  *    standard reliable-checkpoint contract), so the materialized
  *    pipeline executes twice — the insurance premium, paid once,
  *    independent of how many consumers then read the files.
  *
  * The conf value initializes `SparkContext.setCheckpointDir` on first
  * use if no checkpoint dir is set; an already-set checkpoint dir wins
  * (the session owner chose it).
  *
  * Both forms are LAZY (`eager = false`): merely building/explaining a
  * plan runs no job; the first real action computes the rows once and
  * every consumer reads the materialized form.
  */
object Materialize {
  val ReliableDirKey = "graft.materialize.reliable"

  private def reliableDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(ReliableDirKey).map(_.trim).filter(_.nonEmpty)

  private def ensureCheckpointDir(df: DataFrame, dir: String): Unit = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
  }

  /** Lazy materialization cut (explain-safe — no job until an action). */
  def apply(df: DataFrame): DataFrame = reliableDir(df) match {
    case Some(dir) =>
      ensureCheckpointDir(df, dir)
      df.checkpoint(eager = false)
    case None =>
      df.localCheckpoint(eager = false)
  }

  /** Postfix syntax for call sites: `df.materialized`. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Materialize(df)
  }

  /** Eager cut with the iterative-loop stats reset: `localCheckpoint`
    * (and reliable `checkpoint` alike) copies the original plan's
    * ESTIMATED statistics onto the checkpoint node, and join estimates
    * are size products — in a loop the `sizeInBytes` BigInt grows ~4×
    * in bit length per round until the driver spends minutes in
    * BigInteger multiplication inside Catalyst's stats visitor
    * (soak-measured: 447 s → 7 s for a 37k-edge connected components).
    * Used by the Graph engines at every round boundary.
    */
  def eagerNoStats(df: DataFrame): DataFrame =
    org.apache.spark.sql.classic.GraftPlanFactory.statsTruncated(
      reliableDir(df) match {
        case Some(dir) =>
          ensureCheckpointDir(df, dir)
          df.checkpoint()
        case None =>
          df.localCheckpoint()
      })
}

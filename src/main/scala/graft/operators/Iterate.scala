package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Shared materialization step for iterative operators ([[Dedup.connectedComponents]],
 * [[Graphs.pagerank]]): truncates lineage each round so plan depth stays constant
 * and upstream derivations are computed once, not once per round.
 *
 * Durability is chosen by configuration, not code: when the session has a
 * reliable checkpoint directory (`sparkContext.setCheckpointDir`), rounds
 * checkpoint to it and survive executor loss; otherwise `localCheckpoint` keeps
 * blocks in executor memory — correct in local mode and on stable clusters, and
 * the right default for tests. `eager = false` folds the materialization into the
 * next action instead of scheduling its own job (use when an action follows
 * immediately anyway).
 *
 * RELIABLE-checkpoint footprint: Spark never deletes checkpoint files unless
 * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default false), so
 * an N-round iteration over a large dataset leaves N full copies in the
 * checkpoint directory. Sessions that set a checkpoint dir for these
 * operators at scale should enable that cleaner (superseded rounds are
 * unreferenced and get reclaimed on GC) or reclaim the directory after the
 * job; the localCheckpoint default has no such footprint.
 */
object Iterate {
  def materialize(df: DataFrame, eager: Boolean = true): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
  }
}

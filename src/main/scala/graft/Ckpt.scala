package graft

import org.apache.spark.sql.DataFrame

/** Lineage cuts for plan-reused intermediates — every operator that
  * materializes a frame consumed more than once (CC labels, hashed
  * shingles, candidate keys, …) cuts lineage through here, never by
  * calling `localCheckpoint` directly.
  *
  * Why the indirection: `localCheckpoint` stores the cut's blocks on
  * executors. On `local[n]` that is free and exactly right; on a
  * 1000-executor cluster a single executor loss destroys a block of the
  * checkpointed RDD, and because the lineage was truncated there is
  * nothing to recompute from — the job dies. The 100-TB deployment must
  * therefore cut lineage into RELIABLE storage instead. One session flag
  * flips every site in the engine:
  *
  *   spark.graft.reliableCheckpoint=true   — use `Dataset.checkpoint`
  *     (blocks written to the checkpoint dir: HDFS/object store at scale,
  *     survives executor loss; set `spark.graft.checkpointDir`, falling
  *     back to java.io.tmpdir/graft_ckpt for local runs)
  *
  * Default (flag off) stays `localCheckpoint`: the right trade on
  * local[n] and in tests, where executor loss cannot happen and the
  * write-to-storage tax buys nothing. `CkptSpec` runs a checkpoint-heavy
  * operator both ways and asserts identical results.
  */
object Ckpt {

  implicit class CutOps(private val df: DataFrame) extends AnyVal {

    /** Materialize `df` and truncate its lineage; returns the cut frame.
      * `eager=false` defers materialization to first use (only wanted
      * when the caller may never evaluate the frame). */
    def cutLineage(eager: Boolean = true): DataFrame = {
      val spark = df.sparkSession
      if (spark.conf.getOption("spark.graft.reliableCheckpoint")
          .contains("true")) {
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(
            spark.conf.getOption("spark.graft.checkpointDir").getOrElse(
              sys.props("java.io.tmpdir") + "/graft_ckpt"))
        df.checkpoint(eager)
      } else df.localCheckpoint(eager)
    }
  }
}

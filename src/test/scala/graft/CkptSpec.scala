package graft

import java.nio.file.{Files, Paths}

/** Lineage-cut reliability (SCALE.md): every plan-reuse materialization
  * goes through Ckpt.cutLineage, which defaults to localCheckpoint
  * (executor blocks — correct on local[n]) and flips to a RELIABLE
  * checkpoint under spark.graft.reliableCheckpoint=true (the 100-TB
  * deployment mode, where an executor loss must not kill the truncated
  * lineage). This spec drives the heaviest cutLineage consumer — the
  * iterative pointer-jumping connected-components build behind q53 —
  * through the reliable path and pins (a) byte-identical results and
  * (b) that the cut actually landed in the configured checkpoint dir.
  */
class CkptSpec extends SparkSpec {

  test("q53 connected components under reliable checkpointing: identical " +
      "rows, cuts land in the checkpoint dir") {
    val ckptDir = Files.createTempDirectory("graft_rckpt").toString
    val base = graft.operators.Dedup.dupClusters(spark, sf).collect()
      .map(_.toSeq).toSet
    // cloned session: flag + dir scoped, parent session untouched
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.reliableCheckpoint", "true")
    s2.conf.set("spark.graft.checkpointDir", ckptDir)
    val rel = graft.operators.Dedup.dupClusters(s2, sf).collect()
      .map(_.toSeq).toSet
    assert(rel === base,
      "reliable-checkpoint run diverged from localCheckpoint run")
    assert(base.nonEmpty)
    // the reliable path actually wrote checkpoint data (rdd-* dirs)
    import scala.jdk.CollectionConverters._
    val wrote = Files.walk(Paths.get(ckptDir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("rdd-"))
    assert(wrote, s"no rdd checkpoint data under $ckptDir")
    assert(spark.conf.getOption("spark.graft.reliableCheckpoint")
      .forall(_ != "true"), "flag leaked into the shared session")
  }
}

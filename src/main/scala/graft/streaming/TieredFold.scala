package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE tiered-fold loop shared by the LSM sidecar logs
  * ([[KeyedLog]], [[VecLog]]) — previously ~80 duplicated lines
  * differing only in the partitioner and the `_DEPTHS` record, which
  * meant every fold-discipline fix had to land twice (the r12
  * disclosed debt).
  *
  * Contract: sweep crashed staging dirs, then repeatedly fold the
  * LOWEST level holding >= `fanout` segments into ONE next-level
  * segment via the caller's `fold`, and delete the sources. Segments
  * re-list on every pass (a fold can cascade into the next level);
  * `genOf` extracts compaction-generation ordinals from segment names
  * so target names never collide with live ones. Crash-safety is the
  * callers' staged-rename discipline: `fold` must publish atomically
  * (write under a `_compact_tmp_` prefix, rename in), so a crash
  * between publish and the source deletes leaves both visible —
  * readers tolerate the duplicate rows and the next fold converges.
  */
private[streaming] object TieredFold {

  def run(spark: SparkSession, path: String, fanout: Int,
      segs: () => Seq[(String, Int)],
      genOf: String => Option[Long],
      fold: (Seq[String], Int, Long) => Unit): Unit = {
    // fanout 1 would re-fold its own single output forever (each
    // pass leaves one segment at the next level, which is >= 1)
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    val f = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!f.exists(new Path(path))) return
    f.listStatus(new Path(path))
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("_compact_tmp_"))
      .foreach(st => f.delete(st.getPath, true))
    var done = false
    while (!done) {
      val s = segs()
      val byLevel = s.groupBy(_._2)
      byLevel.keys.toSeq.sorted
        .find(l => byLevel(l).size >= fanout) match {
        case None => done = true
        case Some(l) =>
          val src = byLevel(l).map(_._1)
          val gen = s.flatMap(x => genOf(x._1).toSeq)
            .maxOption.getOrElse(0L) + 1
          fold(src, l + 1, gen)
          src.foreach { d =>
            f.delete(new Path(path, d), true)
            // partial source deletion: fold + surviving sources
            // coexist (readers tolerate the duplicate rows)
            graft.FaultPoints.reach("TieredFold.src-delete")
          }
      }
    }
  }
}

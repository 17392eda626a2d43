package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MEASUREMENT-ONLY copy of the pre-r19 PageRank machinery (commit
  * 8818036), kept verbatim so the r20 adjudication of the
  * v8b_knn_pagerank_weighted wall (r19 verdict item 1) can run a true
  * interleaved old-vs-new A/B in one session. Used by NO query path —
  * only `graft.examples.PrAb` calls it; deleted once the adjudication
  * is recorded. The only edits vs the historical file: object renamed,
  * pageRankConverged dropped (not under adjudication), and the
  * CacheRelease auto-release hooks replaced by caller-visible release
  * (the A/B harness unpersists between runs).
  */
private[graft] object GraphPreR19 {

  private case class PrState(e: DataFrame, ids: DataFrame, srcs: Option[DataFrame]) {
    def release(): Unit = { e.unpersist(); ids.unpersist(); srcs.foreach(_.unpersist()); () }
  }

  private def prSetup(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, weightCol: Option[String],
      redistributeDangling: Boolean): PrState = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val rawIds = nodes.select(col(nodeCol).as("__node"))
    val nTotal = rawIds.agg(count(lit(1)).cast("double").as("__cnt"))
    val w = weightCol.map { c =>
      when(col(c).cast("double") >= 0, col(c).cast("double"))
        .otherwise(raise_error(concat(
          lit(s"pageRank: null or negative weight in '$c' for source "),
          col(srcCol).cast("string"))))
    }.getOrElse(lit(1.0))
    val outd = edges.groupBy(col(srcCol).as("__src")).agg(sum(w).as("__deg"))
    val degChecked =
      when(col("__deg") > 0, col("__deg")).otherwise(raise_error(concat(
        lit("pageRank: source "), col("__src").cast("string"),
        lit(" has edges but non-positive total out-weight — filter or threshold upstream"))))
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"), w.as("__w"))
      .join(outd, "__src")
      .select(col("__src"), col("__dst"), col("__w"), degChecked.as("__deg"))
      .persist(lvl)
    val ids = rawIds.crossJoin(broadcast(nTotal)).persist(lvl)
    val srcs =
      if (redistributeDangling) Some(e.select(col("__src").as("__node")).distinct().persist(lvl))
      else None
    PrState(e, ids, srcs)
  }

  private def prRound(st: PrState, pr: DataFrame, damping: Double): DataFrame = {
    val contrib = st.e.join(pr, col("__src") === col("__node"))
      .groupBy(col("__dst").as("__to"))
      .agg(sum(col("__pr") * col("__w") / col("__deg")).as("__m"))
    val inMass = st.srcs match {
      case None => coalesce(col("__m"), lit(0.0))
      case Some(_) => coalesce(col("__m"), lit(0.0)) + col("__dm") / col("__cnt")
    }
    val joined = st.ids.join(contrib, col("__node") === col("__to"), "left")
    val withDangling = st.srcs match {
      case None => joined
      case Some(s) =>
        val dangMass = pr.join(s, Seq("__node"), "left_anti")
          .agg(coalesce(sum(col("__pr")), lit(0.0)).as("__dm"))
        joined.crossJoin(broadcast(dangMass))
    }
    withDangling.select(col("__node"),
      (lit(1.0 - damping) / col("__cnt") + lit(damping) * inMass).as("__pr"))
  }

  private def prInit(st: PrState): DataFrame =
    st.ids.select(col("__node"), (lit(1.0) / col("__cnt")).as("__pr"))

  /** Pre-r19 lazy fixed-iteration pageRank. Returns (result, release):
    * the caller runs ONE action on `result` and then calls `release()`
    * (the historical version auto-released via CacheRelease; explicit
    * release keeps this measurement copy out of the operators' private
    * listener machinery).
    */
  def pageRankWithRelease(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, iters: Int = 3,
      damping: Double = 0.85, weightCol: Option[String] = None,
      redistributeDangling: Boolean = false): (DataFrame, () => Unit) = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1), got $damping")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val st = prSetup(edges, srcCol, dstCol, nodes, nodeCol, weightCol, redistributeDangling)
    val roundCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var pr = prInit(st)
    (1 to iters).foreach { round =>
      pr = prRound(st, pr, damping)
      if (redistributeDangling && round < iters) {
        pr = pr.persist(lvl)
        roundCaches += pr
      }
    }
    val result = pr.select(col("__node").as(nodeCol), col("__pr").as("pagerank"))
    val release = () => {
      st.release()
      roundCaches.foreach { c => c.unpersist(); () }
    }
    (result, release)
  }
}

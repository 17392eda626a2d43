package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dset.DSet

/** Driver-hash gates for the typed DSet facade operators that previously
  * had only ScalaTest coverage (r7 verdict #1): generation (`init`),
  * filter-map (`choose`), batch map (`mapByCollection`), the DKV
  * group/reduce pair, `crossJoinFold`, and `merge` + `binSortNByKey`.
  * Each query routes its data through the facade operator and lands on an
  * integer-exact (or round-6) result a DuckDB oracle can replay, so a
  * semantic slip in the operator — a dropped element, a misrouted key, a
  * wrong batch boundary, a misordered sort — fails the hash, not just a
  * spec.
  */
object FacadeQueries {

  /** Double dot product, summed left-to-right per element — the exact
    * arithmetic DuckDB's `list_dot_product` performs on
    * `list_transform(v, x -> x::DOUBLE)`, so fx6's fold is oracle-replayable.
    */
  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var i = 0; var s = 0.0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Facade generation chain (reference init/initN
    // `DSetGenerics.fs:623-705`, choose `DSetGenerics.fs:1015-1027`,
    // mapByCollection `DSetGenerics.fs:1127-1137`): 8 generated partitions
    // of deliberately uneven size, filtered+mapped by `choose`, then
    // batch-mapped so every row carries its partition's post-choose batch
    // size. The oracle replays generation with `range()` — a wrong
    // partition size, a row `choose` should have dropped, or a batch that
    // crossed a partition boundary all diverge.
    "fx4_init_choose_batch" -> { (s, _) =>
      import s.implicits._
      val gen = DSet.initN[(Int, Long)](s, 8)((_, pi) => 100 + pi * 10) {
        (pi, serial) => (pi, pi.toLong * 1000L + serial)
      }
      gen.choose[(Int, Long)](t => if (t._2 % 3 == 0) Some(t) else None)
        .mapByCollection(arr => arr.map(t => (t._1, t._2, arr.length)))
        .ds.toDF("part_id", "k", "batch_n")
    },

    // DKV group/reduce pair (reference `DKV.fs:99-138`; test pattern
    // `tests/CoreLib/DKV.fs:429-508`): the same token pairs flow through
    // BOTH `reduceByKey` (map-side combine) and `groupByKeyN` (explicit
    // reducer fan-in, full value lists) — the oracle asserts the two
    // independent paths agree with a plain GROUP BY count.
    "fx5_kv_group_reduce" -> { (s, dir) =>
      import s.implicits._
      import graft.dset.DSet.KVOps
      val docs = new DSet(Tables.load(s, dir, "documents").select(col("text")).as[String])
      val pairs = docs.collectSeq(t => t.split(" ").iterator.filter(_.nonEmpty).map(w => (w, 1L)))
      val red = pairs.reduceByKey(_ + _)
      val grp = pairs.groupByKeyN(8).mapByValue(_.length.toLong)
      red.ds.toDF("word", "cnt").join(grp.ds.toDF("word", "n_grp"), "word")
    },

    // crossJoinFold k-NN shape (reference `DSetGenerics.fs:1695-1726`):
    // each query vector folds over the broadcast corpus keeping its
    // single nearest neighbour by cosine (ties broken toward the smaller
    // id). The oracle recomputes every pair and takes row_number()=1 —
    // a fold that skipped an element or mis-compared would pick a
    // different neighbour and fail the hash. Verification-scale gate
    // (50 query vectors); the corpus-scale ANN path is v3/km2.
    "fx6_crossfold_knn" -> { (s, dir) =>
      import s.implicits._
      import graft.dset.DSet.CrossOps
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      val queriesSide = new DSet(emb.filter(col("vec_id") < 50).as[(Long, Array[Float])])
      val corpus = new DSet(emb)
      queriesSide.crossJoinFoldByElem(corpus)((-1L, -1L, -2.0)) { (st, q, c) =>
        if (q._1 == c._1) (q._1, st._2, st._3)
        else {
          val cos = dotD(q._2, c._2) / (math.sqrt(dotD(q._2, q._2)) * math.sqrt(dotD(c._2, c._2)))
          if (cos > st._3 || (cos == st._3 && c._1 < st._2)) (q._1, c._1, cos)
          else (q._1, st._2, st._3)
        }
      }.ds.toDF("qid", "neighbor", "cos_raw")
        .select(col("qid"), col("neighbor"), round(col("cos_raw"), 6).as("sim"))
    },

    // Async element map + DKV filter/value-map + right-outer merge join
    // (reference asyncMap `DSetGenerics.fs:1055-1087`, filterByKey
    // `DKV.fs:172-176`, parallelMapByValue `DKV.fs:185-198`,
    // rightOuterJoinByMerge `DKV.fs:227-231`): order counts flow through
    // the bounded-window async path (≡ map for a pure f — a dropped or
    // duplicated element under the window fails the count), the customer
    // side is key-filtered and value-mapped concurrently, and the
    // right-outer join must emit EVERY even customer, 0-filled when no
    // orders matched.
    "fx8_async_kv_outer" -> { (s, dir) =>
      import s.implicits._
      import graft.dset.DSet.KVOps
      val ordCnt = new DSet(Tables.load(s, dir, "orders").select(col("o_custkey")).as[Long])
        .asyncMap(8)(k => (k, 1L))
        .reduceByKey(_ + _)
      val evenCust = new DSet(Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)])
        .filterByKey(_ % 2 == 0)
        .parallelMapByValue(4)(_.toLowerCase)
      ordCnt.rightOuterJoinByMerge(evenCust)((cnt, seg) => (cnt.getOrElse(0L), seg))
        .map(t => (t._1, t._2._1, t._2._2))
        .ds.toDF("c_custkey", "n_orders", "segment")
    },

    // multicast + broadcast-hash join (reference multicast
    // `DSetGenerics.fs:1315-1345`, innerJoinByHash declared at
    // `DKV.fs:236-258`): the nation table is multicast as a broadcast
    // variable and consulted per batch to label customer counts — an
    // incomplete broadcast (missing nation) would throw, a stale one
    // would mislabel and fail the hash; supplier counts reach the same
    // labels through innerJoinByHash, and the final equi-join must agree
    // with the oracle's two independent GROUP BYs.
    "fx9_multicast_hashjoin" -> { (s, dir) =>
      import s.implicits._
      import graft.dset.DSet.KVOps
      val natKv = new DSet(Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name")).as[(Long, String)])
      val bc = natKv.multicast()
      val custCnt = new DSet(Tables.load(s, dir, "customer").select(col("c_nationkey")).as[Long])
        .mapByCollection { arr => val m = bc.value.toMap; arr.map(k => (m(k), 1L)) }
        .reduceByKey(_ + _)
      val suppCnt = new DSet(Tables.load(s, dir, "supplier").select(col("s_nationkey")).as[Long])
        .map(k => (k, 1L))
        .reduceByKey(_ + _)
        .innerJoinByHash(natKv)((cnt, name) => (name, cnt))
        .map(_._2)
      custCnt.ds.toDF("n_name", "n_cust")
        .join(suppCnt.ds.toDF("n_name", "n_supp"), "n_name")
    },

    // merge + binSortNByKey global sort (reference merge
    // `DSetGenerics.fs:1535-1556`, binSortNByKey `DKV.fs:140-169`; test
    // pattern `tests/CoreLib/DSet.fs:953-1116`): the table splits into
    // two halves that `merge` re-unions, the sampled range partitioner
    // sorts globally, and zipWithIndex materializes each row's GLOBAL
    // rank — the oracle's row_number() OVER (ORDER BY key) must match
    // rank-for-rank, so a single out-of-order row (mis-sampled boundary,
    // unsorted bin) fails the hash. Keys are unique, so rank is total.
    "fx7_merge_binsort" -> { (s, dir) =>
      import s.implicits._
      import graft.dset.DSet.KVOps
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
      val evens = new DSet(orders.filter(col("o_orderkey") % 2 === 0).as[(Long, Double)])
      val odds = new DSet(orders.filter(col("o_orderkey") % 2 =!= 0).as[(Long, Double)])
      val sorted = evens.merge(odds).binSortNByKey(8)
      DSet.fromRDD(s, sorted.ds.rdd.zipWithIndex.map { case ((k, v), i) => (i, k, v) })
        .ds.toDF("rank", "o_orderkey", "o_totalprice")
    }
  )

  val oracles: Map[String, String] = Map(
    "fx4_init_choose_batch" ->
      """WITH gen AS (
           SELECT p.pi::INTEGER AS part_id, (p.pi * 1000 + s.serial)::BIGINT AS k
           FROM range(8) p(pi) CROSS JOIN range(170) s(serial)
           WHERE s.serial < 100 + p.pi * 10),
         ch AS (SELECT part_id, k FROM gen WHERE k % 3 = 0)
         SELECT part_id, k,
           (count(*) OVER (PARTITION BY part_id))::INTEGER AS batch_n
         FROM ch""",
    "fx5_kv_group_reduce" ->
      """SELECT word, count(*)::BIGINT AS cnt, count(*)::BIGINT AS n_grp FROM (
           SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY word""",
    "fx6_crossfold_knn" ->
      """WITH ed AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT vec_id, v FROM ed WHERE vec_id < 50),
         pairs AS (
           SELECT q.vec_id AS qid, e.vec_id AS neighbor,
             list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
           FROM q JOIN ed e ON e.vec_id <> q.vec_id),
         ranked AS (
           SELECT qid, neighbor, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor ASC) AS rn
           FROM pairs)
         SELECT qid, neighbor, round(cos, 6) AS sim FROM ranked WHERE rn = 1""",
    "fx7_merge_binsort" ->
      """SELECT (row_number() OVER (ORDER BY o_orderkey) - 1)::BIGINT AS rank,
           o_orderkey, o_totalprice
         FROM orders""",
    "fx8_async_kv_outer" ->
      """SELECT c_custkey, coalesce(o.cnt, 0)::BIGINT AS n_orders,
              lower(c_mktsegment) AS segment
         FROM customer LEFT JOIN (
           SELECT o_custkey, count(*)::BIGINT AS cnt FROM orders GROUP BY o_custkey) o
           ON o.o_custkey = c_custkey
         WHERE c_custkey % 2 = 0""",
    "fx9_multicast_hashjoin" ->
      """WITH c AS (
           SELECT n_name, count(*)::BIGINT AS n_cust
           FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name),
         s AS (
           SELECT n_name, count(*)::BIGINT AS n_supp
           FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name)
         SELECT c.n_name, n_cust, n_supp FROM c JOIN s USING (n_name)"""
  )
}

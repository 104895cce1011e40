package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle + round-robin sharding — the
  * training-order step: a curated corpus must be (a) shuffled so no
  * shard is a topical/temporal run of the crawl, (b) identically on
  * every engine and every rerun (resume after a failed write must
  * produce byte-identical shards), and (c) split into `shards` files
  * of near-equal document count. The order is the seedless
  * deterministic rank of [[Sampling.detRank]] (md5 of the id's string
  * rendering — a corpus-wide pseudo-random permutation with no RNG
  * and no driver state), `pos` is the 0-based global position in that
  * order, and `shard = pos % shards` deals documents round-robin so
  * shard sizes differ by at most one.
  *
  * The rule is one global `row_number` window — SQL-expressible, the
  * DuckDB oracle — but a naive `Window.orderBy(rank)` funnels the
  * corpus through ONE task. This is the same parallel-prefix escape
  * as [[Packing.packByBudget]], counting rows instead of tokens:
  * range-partition by (rank, id), per-partition `row_number` (every
  * window group is one bounded range partition), per-partition counts
  * -> driver prefix offsets (P scalars, control plane only), one
  * map-side add. `localCheckpoint` pins the materialized range
  * boundaries — RangePartitioner re-samples per job, so without the
  * pin a row near a boundary could land in different partitions for
  * the counts job and the output job, shifting every downstream
  * position by one.
  *
  * Writing the result is `repartition(shards, col("shard"))` +
  * `sortWithinPartitions("pos")` — one shuffle, each shard one sorted
  * file.
  */
object Shuffling {

  /** The parallel-prefix global rank, reusable for ANY total order:
    * appends 0-based `pos` = the input's global rank under
    * `orderCols` (which MUST be a total order — append the id as the
    * last key). Range-partition by the order keys, per-partition
    * `row_number`, per-partition counts -> driver prefix offsets
    * (P control-plane scalars, never data), one map-side add.
    * `localCheckpoint` pins the sampled range boundaries (see object
    * doc). Input columns pass through.
    */
  def globalRank(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
                 parts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(p, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val local = ranged.withColumn("__rn", row_number().over(w))
      .localCheckpoint()
    val totals = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__tot"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets = new Array[Long](p)
    var acc = 0L
    var i = 0
    while (i < p) {
      offsets(i) = acc
      acc += totals.getOrElse(i, 0L)
      i += 1
    }
    val offLit = typedLit(offsets.toSeq)
    local
      .withColumn("pos", element_at(offLit, col("__pid") + 1) + col("__rn") - 1)
      .drop("__pid", "__rn")
  }

  /** (idCol) -> (idCol, pos, shard); `pos` is the global rank in
    * deterministic-shuffle order, `shard` = pos % shards.
    */
  def deterministicShuffle(docs: DataFrame, shards: Int,
                           idCol: String = "doc_id", parts: Int = 0): DataFrame = {
    require(shards > 0, "shards must be positive")
    val base = docs.select(col(idCol), Sampling.detRank(col(idCol)).as("__r"))
    globalRank(base, Seq(col("__r"), col(idCol)), parts)
      .withColumn("shard", pmod(col("pos"), lit(shards.toLong)).cast("int"))
      .select(col(idCol), col("pos"), col("shard"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Terminal layout step of the training-data pipeline: write the
  * prepared corpus as deterministic shards a trainer can consume —
  * `split=<v>/shard=<k>/` directories of parquet, stable under
  * re-runs and incremental rebuilds.
  *
  * Sharding is BY CONTENT KEY (pmod of a caller-supplied key column,
  * e.g. `fnv64(text)`), not by partition id or row position, so a
  * document lands in the same shard whatever the upstream
  * partitioning did — the `q_split_assign` argument applied to
  * output layout. Within a shard, rows are ordered by `orderCol`
  * (and files cut sequentially from that order by
  * `maxRecordsPerFile`), so two runs over the same data produce
  * byte-identical shard contents.
  *
  * Plan: ONE hash exchange on the shard id (numShards partitions —
  * sized by the caller to the trainer's reader parallelism), an
  * in-partition sort that ALSO covers the dynamic-partition columns
  * (so `FileFormatWriter` sees its required ordering satisfied and
  * inserts no second sort), then a straight write. At 100 TB this is
  * the minimum possible movement for a sharded, ordered layout: the
  * one shuffle every re-bucketing costs.
  */
object Shards {

  /** Write `docs` as `split=<v>/shard=<k>` parquet shards under
    * `outDir`. `splitCol` must name an existing column (train/val/
    * test labels); `shardKey` is any deterministic long column;
    * `maxRecordsPerFile <= 0` leaves file cutting to one file per
    * (split, shard). */
  def writeTrainingShards(docs: DataFrame, outDir: String,
                          splitCol: String, shardKey: Column,
                          numShards: Int, orderCol: Column,
                          maxRecordsPerFile: Long = 0L): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val sharded = docs
      .withColumn("shard", pmod(shardKey, lit(numShards.toLong)))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col(splitCol), col("shard"), orderCol)
    val writer = sharded.write.mode("overwrite")
      .partitionBy(splitCol, "shard")
    val withOpt =
      if (maxRecordsPerFile > 0)
        writer.option("maxRecordsPerFile", maxRecordsPerFile)
      else writer
    withOpt.parquet(outDir)
  }
}

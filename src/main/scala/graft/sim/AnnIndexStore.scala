package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence + incremental maintenance for the trained PQ index — the
  * missing lifecycle half of the serving story: `pqTrainedIndex` trains
  * (Lloyd rounds over the corpus) and `AnnServeStream` serves, but a real
  * deployment trains ONCE, persists, and serves from the saved index
  * across sessions while new corpus vectors arrive continuously.
  *
  * Layout (plain parquet — any engine can read it, and at 100 TB the
  * codes table is the index: 4 small ints per vector per subspace,
  * partition-prunable, while the codebook is ≤ nSub×8 rows):
  *   <dir>/codes.parquet     (vec_id, label, subspace, code)
  *   <dir>/codebook.parquet  (subspace, cid, carr: array<bigint>)
  *
  * Incremental append NEVER retrains: [[encode]] assigns new vectors to
  * the FROZEN codebook with the exact trainer kernels
  * (`pqSubspaceSplit` split, `L2SqLong` distances, the d2·8+cid
  * long-encoded argmin — a codegen HashAggregate, never a struct-min
  * SortAggregate), so appended codes are bit-identical to what a full
  * re-encode of the union would produce (`AnnIndexStoreSpec` pins it).
  * Append = one parquet append of the new rows' codes; the codebook is
  * immutable until a deliberate retrain replaces the index version.
  */
object AnnIndexStore {

  def save(codes: DataFrame, carr: DataFrame, dir: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$dir/codes.parquet")
    carr.write.mode("overwrite").parquet(s"$dir/codebook.parquet")
  }

  /** Append-encode new vectors into a saved index (frozen codebook). */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame): Unit = {
    val carr = spark.read.parquet(s"$dir/codebook.parquet")
    encode(newVecs, carr).write.mode("append").parquet(s"$dir/codes.parquet")
  }

  /** Load a saved index into the prepared serving form (pre-partitioned
    * persisted codes + collected literal codebook — see
    * [[graft.streaming.AnnServeStream.prepare]]). */
  def load(spark: SparkSession, dir: String)
      : graft.streaming.AnnServeStream.TrainedServeIndex =
    graft.streaming.AnnServeStream.prepare(
      spark.read.parquet(s"$dir/codes.parquet"),
      spark.read.parquet(s"$dir/codebook.parquet"))

  /** Assign `(vec_id, label, embedding)` rows to a FROZEN codebook:
    * (vec_id, label, subspace, code). THE trainer's kernels, not copies —
    * the exactness contract is that encode(frozen, new rows) equals the
    * rows a full re-encode would produce for them. */
  def encode(vecs: DataFrame, carr: DataFrame): DataFrame = {
    val vsub = vecs
      .select(col("vec_id"), col("label"),
        explode(graft.queries.ExtQueries
          .pqSubspaceSplit(4, "subspace", "varr")).as("p"))
      .select(col("vec_id"), col("label"), col("p.subspace").as("subspace"),
        col("p.varr").as("varr"))
    vsub.join(broadcast(carr), Seq("subspace"))
      .select(col("vec_id"), col("label"), col("subspace"), col("cid"),
        graft.functions.L2SqLong(col("varr"), col("carr")).as("d2"))
      .groupBy(col("vec_id"), col("label"), col("subspace"))
      .agg(min(col("d2") * 8 + col("cid")).as("m"))
      .select(col("vec_id"), col("label"), col("subspace"),
        pmod(col("m"), lit(8L)).as("code"))
  }
}

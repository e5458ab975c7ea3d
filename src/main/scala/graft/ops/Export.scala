package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.ext.Text
import graft.functions.{NativeHash, PortableHash}

/** Export accounting: the integrity manifest a pipeline emits when it
  * ships a prepared corpus to training. Each shard gets row/token counts
  * and an order-independent content checksum, so the consumer can verify
  * a transfer (or a re-run) without re-reading byte-identical order —
  * XOR is commutative/associative, so the checksum is stable under any
  * partitioning, task order, or file split.
  *
  * Scale shape (100 TB): one scan; per-row fingerprint arithmetic; a
  * groupBy on the shard id with map-side partial aggregation (counts,
  * sums, XORs all combine associatively) collapsing to |shards| rows.
  * Nothing but (shard, partials) crosses the wire.
  */
object Export {

  /** Per-row content fingerprint: mix the text's rolling hash with the
    * id so identical texts under different ids stay distinguishable.
    * Stays in [0, P) — products bounded far below 2⁶³.
    */
  private def rowFp(idCol: String, textCol: String) =
    pmod(NativeHash.polyHash(col(textCol)) * lit(31L) + col(idCol),
      lit(PortableHash.P))

  /** DuckDB twin of the row fingerprint. */
  def rowFpSql(idE: String, textE: String): String =
    s"((${PortableHash.polyHashSql(textE)}) * 31 + $idE) % ${PortableHash.P}"

  /** Manifest of a sharded corpus: per shard, document count, token
    * count, and the XOR of row fingerprints.
    */
  def shardManifest(df: DataFrame, shardCol: String = "shard",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(Text.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        call_function("bit_xor", rowFp(idCol, textCol)).as("content_xor"))

  /** DuckDB twin of [[shardManifest]] over `table` (which must already
    * carry the shard column).
    */
  def shardManifestSql(table: String, shardE: String, idE: String,
      textE: String): String =
    s"""SELECT $shardE AS shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(string_split($textE, ' '))) AS BIGINT) AS n_tokens,
       |  bit_xor(${rowFpSql(idE, textE)}) AS content_xor
       |FROM $table GROUP BY $shardE""".stripMargin

  /** Write the corpus partitioned by shard and return the manifest
    * recomputed FROM THE WRITTEN FILES — the honest export check: what
    * landed on disk, not what was about to be written.
    */
  def writeShards(df: DataFrame, path: String, shardCol: String = "shard",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    df.write.mode(SaveMode.Overwrite).partitionBy(shardCol).parquet(path)
    shardManifest(df.sparkSession.read.parquet(path),
      shardCol, idCol, textCol)
  }
}

package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Passage chunking — retrieval/embedding prep: cut each document into
  * fixed-size word windows with overlap (the RAG chunker shape: window W,
  * stride S < W, so consecutive chunks share W-S words of context).
  *
  * Chunk-count contract (deterministic, both engines): one chunk when
  * nw <= W, else ceil((nw - W) / S) + 1 — the last chunk always reaches the
  * final word and no chunk starts past it (no degenerate tail windows fully
  * contained in their predecessor).
  *
  * Pure map-side explode (`transform(sequence(...))` + `slice`) inside
  * whole-stage codegen: zero shuffle, output rows ~ corpus tokens / S —
  * the plan a 10^12-doc chunking pass needs (each task chunks its split,
  * nothing moves). */
object Chunker {

  val Window = 64
  val Stride = 48

  /** (doc_id, chunk_id, n_words, chunk_text) — chunk i covers words
    * [i*S+1, min(i*S+W, nw)], 1-based. */
  def chunk(docs: DataFrame, window: Int = Window, stride: Int = Stride): DataFrame = {
    require(stride > 0 && window >= stride, "need 0 < stride <= window")
    docs
      .withColumn("ws", split(col("text"), " ", -1))
      .withColumn("nw", size(col("ws")).cast("long"))
      .withColumn("nc",
        when(col("nw") <= window, 1L)
          .otherwise(expr(s"(nw - $window + ${stride - 1}) div $stride + 1")))
      .select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(0L, nc - 1), i -> struct(
             |  i AS chunk_id,
             |  least(cast($window as bigint), nw - i * $stride) AS n_words,
             |  array_join(slice(ws, cast(i * $stride + 1 as int),
             |                   cast(least(cast($window as bigint), nw - i * $stride) as int)), ' ') AS chunk_text
             |))""".stripMargin)).as("ch"))
      .select(col("doc_id"), col("ch.chunk_id"), col("ch.n_words"), col("ch.chunk_text"))
  }
}

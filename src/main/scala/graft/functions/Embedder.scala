package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import CrossHash.hash60

/** Deterministic local embedder.
  *
  * The reference embeds every chunk with one OpenAI HTTP call per chunk
  * (parser_pinecone_storage.py:33,148 — text-embedding-ada-002, dim 1536,
  * unbatched). That service is non-deterministic and unreachable here, so the
  * engine's embedder is a pure function of the text: component d =
  * (hash60(text || "#emb#" || d) % 2000001) / 1e6 - 1.0  ∈ [-1, 1].
  *
  * Properties that matter:
  *  - deterministic and cross-engine (DuckDB reproduces each component
  *    exactly — modulo and IEEE double division are bit-identical);
  *  - identical text → identical vector (the reference's content-addressing
  *    intent, minus its wall-clock id salt at parser_pinecone_storage.py:147);
  *  - computed columnar per-row, no RPC: at 100 TB this is a map-only stage,
  *    where the reference's per-chunk HTTP loop would be the bottleneck.
  *
  * Dimension is configuration, exactly as in the reference (1536 at
  * parser_pinecone_storage.py:20; 64 in the test fixtures).
  */
object Embedder {

  /** Embed a text column into `array<double>` of length `dim`. */
  def embed(text: Column, dim: Int): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      d =>
        (hash60(concat(text, lit("#emb#"), d.cast("string"))) % 2000001L)
          .cast("double") / 1e6 - 1.0)

  /** Driver-side embedding of a literal query string (for top-k search
    * against a stored index, mirroring ra/agent.py:111 `embed_query`). */
  def embedQuery(q: String, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      (CrossHash.md5Hash60(s"$q#emb#$d") % 2000001L).toDouble / 1e6 - 1.0
    }
}

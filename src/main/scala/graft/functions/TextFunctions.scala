package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import CrossHash.hash60

/** Text operators: chunking, tokenisation, shingling, MinHash, SimHash,
  * quality metrics, language-ID, fingerprinting.
  *
  * Everything is built from Spark's codegen'd built-ins / higher-order
  * functions — no UDFs — and every construct has an exact DuckDB
  * equivalent (documented per method) so results are oracle-checkable.
  *
  * Reference semantics covered:
  *  - chunking: RecursiveCharacterTextSplitter(chunk_size=3000,
  *    chunk_overlap=200) at parser_pinecone_storage.py:133. Our spec is
  *    fixed-size-with-overlap (documented deviation, SURVEY.md §7.4) so the
  *    operation is SQL-expressible.
  *  - the dedup / fingerprint / quality family extends the reference per the
  *    LLM-data-pipeline north star (BASELINE.json).
  */
object TextFunctions {

  /** Fixed-size chunking with overlap. Chunk i = substring(text,
    * i*(size-overlap)+1, size); number of chunks = max(1,
    * ceil((len-overlap)/(size-overlap))). DuckDB:
    * `list_transform(range(0, nchunks), i -> text[i*step+1 : ...])` via
    * substring(text, i*step+1, size). */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    require(size > overlap && overlap >= 0)
    val step = size - overlap
    val n = greatest(
      lit(1),
      ceil((length(text) - lit(overlap)).cast("double") / lit(step))
        .cast("int"))
    transform(
      sequence(lit(0), n - 1),
      i => text.substr(i * step + 1, lit(size)))
  }

  /** Whitespace tokens. DuckDB: `string_split(text, ' ')`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Let-binding for column expressions: evaluates `v` once per row and
    * exposes it to `f` as a lambda variable. Catalyst inlines a plain
    * expression at every reference site — for an expression used inside a
    * per-element lambda that turns O(n) work into O(n·cost(v)) (measured:
    * shingling re-ran split(text) per element_at, 150 cpu-seconds for
    * 260k shingles). `transform` binds its lambda variable to the
    * evaluated value, so wrapping v in a 1-element array buys a real let. */
  def bound(v: Column)(f: Column => Column): Column =
    element_at(transform(array(v), f), 1)

  /** Word n-gram shingles; whole text if fewer than n tokens.
    * DuckDB: list_transform(range(0, len(t)-n+1), i -> t[i+1]||' '||...). */
  def shingles(text: Column, n: Int): Column =
    bound(tokens(text)) { t =>
      when(size(t) < n, array(text)).otherwise(
        transform(
          sequence(lit(0), size(t) - n),
          i => concat_ws(" ", (1 to n).map(k => element_at(t, i + k)): _*)))
    }

  /** Non-overlapping `n`-token blocks (tumbling shingles) — the span unit
    * of exact-substring dedup; the trailing partial block is kept as-is.
    * DuckDB: array_to_string(t[i*n+1 : i*n+n], ' ') over
    * range(0, floor((len(t)-1)/n)+1). */
  def blocks(text: Column, n: Int): Column =
    bound(tokens(text)) { t =>
      transform(
        sequence(lit(0), floor((size(t) - 1) / lit(n)).cast("int")),
        i => concat_ws(" ", slice(t, i * n + 1, lit(n))))
    }

  /** MinHash signature: `k` independent 60-bit md5-derived hash functions
    * over a shingle array; element j = min over shingles of hash60(s#j).
    * DuckDB: list_min(list_transform(sh, s -> hash60(s || '#j'))). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleCol, s => hash60(s, j)))
    }: _*)

  /** Exact Jaccard similarity of two shingle arrays (as sets).
    * DuckDB: len(list_intersect(a,b)) / len(list_distinct(list_concat(a,b))). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni   = size(array_distinct(concat(a, b))).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }

  /** 32-bit SimHash over a precomputed token-hash array (use
    * `transform(tokens(text), hash60)` to build it once). Bit b of the
    * result is set iff the majority of token hashes have bit b set.
    * DuckDB: same construction with `(h >> b) & 1` and list_sum. */
  def simhash32(tokenHashes: Column): Column =
    (0 until 32).map { b =>
      val vote = aggregate(
        tokenHashes,
        lit(0),
        (acc, h) =>
          acc + when(shiftright(h, b) % 2 === 1, lit(1)).otherwise(lit(-1)))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two packed bit signatures.
    * DuckDB: bit_count(xor(a, b)). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Document fingerprint: minimum 60-bit hash over all character 8-grams
    * (a 1-permutation MinHash over a rolling window — robust to word
    * reordering at the edges). DuckDB: list_min(list_transform(
    * range(1, greatest(length(text)-7,1)+1), i -> hash60(substring(text,i,8)))). */
  def fingerprint(text: Column): Column =
    array_min(
      transform(
        sequence(lit(1), greatest(length(text) - 7, lit(1))),
        i => hash60(text.substr(i, lit(8)))))

  /** English-ish stopwords used by quality scoring / language ID. */
  val StopwordsEn: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  /** Ratio of tokens that are stopwords.
    * DuckDB: len(list_filter(t, x -> x in (...))) / greatest(len(t),1).
    * Token array is let-bound so split(text) runs once, not twice. */
  def stopwordRatio(text: Column, stops: Seq[String] = StopwordsEn): Column =
    bound(tokens(text)) { t =>
      size(filter(t, x => x.isin(stops.map(s => s: Any): _*))).cast("double") /
        greatest(size(t), lit(1)).cast("double")
    }

  /** Punctuation character ratio. DuckDB: identical regexp_replace form. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  /** BPE-ish token count: alpha runs, digit runs, and single other
    * non-space chars each count as one token.
    * DuckDB: len(regexp_extract_all(text, pattern)). */
  val BpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVFADC — the compressed production vector index (coarse IVF quantizer
  * to prune, PQ fine quantizer to score, Jégou et al. 2011) — routed
  * THROUGH [[SnapshotStore]], so the flagship index gets the same
  * atomicity / OCC / time-travel story [[VersionedIvf]] gives the
  * uncompressed layout. The bare cascade ([[PqIndex.searchIvfIndexed]],
  * oracle s14) persists FOUR artifacts with no transactional tie: IVF
  * cell partitions, IVF centroid sidecar, PQ codes, PQ codebook — a
  * crash between any two leaves quantizers and codes disagreeing. Here
  * the WHOLE index state is ONE manifest:
  *
  *  - rows are `(doc_id = vec_id, cent_id, codes)` — one row per vector,
  *    its m PQ codes as a single array cell (the 32×-compressed
  *    representation; raw embeddings are NOT stored, which is the point
  *    of serving ANN from codes at 100 TB) — written range-clustered by
  *    cent_id with doc_id + cent_id statistics declared, so probes read
  *    cells through stats skipping and keyed verbs prune by doc_id;
  *  - the coarse centroids ride as `#ivfcent` lines, the PQ codebook as
  *    `#pqcent` lines, and `(dim, m, k)` as a `#pqgeom` line — a few KB
  *    of geometry in the commit root, atomically consistent with the
  *    rows by construction (the create-exclusive publish);
  *  - every verb (upsert, delete) reads geometry AT the observed
  *    version and publishes with `expectedVersion = observed` inside
  *    [[SnapshotStore.withConflictRetry]] — racing verbs serialize,
  *    exactly the [[VersionedIvf]] discipline.
  *
  * No rebalance verb: codes cannot be re-assigned to split cells
  * without the raw embeddings this layout deliberately does not store —
  * re-clustering a compressed index is a rebuild from the source
  * corpus, the same contract the bare PQ layout has.
  *
  * Reference anchor: the reference's Pinecone index is the compressed
  * serving tier its per-vector upserts mutate with no transactional
  * story (`airflow/dags/parser_pinecone_storage.py:154,172,183`); this
  * is that tier with lakehouse semantics.
  */
object VersionedIvfAdc {

  private val CoarsePrefix = "#ivfcent\t"
  private val BookPrefix = "#pqcent\t"
  private val GeomPrefix = "#pqgeom\t"

  private def geomLine(dim: Int, m: Int, k: Int): String =
    s"$GeomPrefix$dim\t$m\t$k"

  /** The `(dim, m, k)` the index was written with — stored in the
    * manifest so searches and upserts can never encode against the
    * wrong subspace split (the `_graft_pq` sidecar contract, manifested). */
  def storedGeometry(spark: SparkSession, root: String,
      version: Long = -1L): (Int, Int, Int) = {
    val lines =
      SnapshotStore.storedMetaLines(spark, root, GeomPrefix, version)
    require(lines.nonEmpty,
      s"no #pqgeom line at $root — not a VersionedIvfAdc store " +
        "(or a foreign verb dropped the lines)")
    val Array(d, m, k) = lines.head.stripPrefix(GeomPrefix).split("\t", 3)
    (d.toInt, m.toInt, k.toInt)
  }

  /** Coarse (IVF) centroids of a published version. */
  def storedCoarse(spark: SparkSession, root: String,
      version: Long = -1L): Array[(Long, Array[Long])] =
    VersionedIvf.storedVecLines(spark, root, CoarsePrefix, version,
      "VersionedIvfAdc")

  /** PQ codebook of a published version — the k quantized full-dim
    * vectors whose subspace slices are the per-subspace centroids. */
  def storedBook(spark: SparkSession, root: String,
      version: Long = -1L): Array[(Long, Array[Long])] =
    VersionedIvf.storedVecLines(spark, root, BookPrefix, version,
      "VersionedIvfAdc")

  private def metaLines(coarse: Array[(Long, Array[Long])],
      book: Array[(Long, Array[Long])], dim: Int, m: Int,
      k: Int): Seq[String] =
    VersionedIvf.vecLines(CoarsePrefix, coarse) ++
      VersionedIvf.vecLines(BookPrefix, book) :+ geomLine(dim, m, k)

  private def bucketsAt(spark: SparkSession, root: String,
      version: Long): Int =
    SnapshotStore.storedBuckets(spark, root, version).getOrElse(
      throw new IllegalArgumentException(
        s"store at $root records no bucket modulus"))

  private def requirePublished(observed: Long, root: String,
      verb: String): Unit =
    require(observed > 0,
      s"VersionedIvfAdc.$verb: no published version at $root — write() " +
        "an initial index first")

  /** Assign + encode in ONE scan: nearest coarse cell from the fused
    * cell-distance projection, m PQ codes from the fused code
    * projection — no join, no shuffle beyond the final range
    * clustering. */
  private def encodedRows(emb: DataFrame,
      coarse: Array[(Long, Array[Long])],
      book: Array[(Long, Array[Long])], dim: Int, m: Int): DataFrame =
    IvfIndex.cellAssign(emb, coarse)
      .select(col("vec_id").cast("long").as("doc_id"),
        col("cent_id"),
        PqIndex.codesColumn(book, dim, m).as("codes"))
      .repartitionByRange(math.max(4, coarse.length / 2), col("cent_id"))

  /** Build and publish version 1: both quantizers trained (the
    * deterministic first-k seeds [[IvfIndex.centroids]] /
    * [[PqIndex.collectCodebook]] use), every vector assigned + encoded,
    * rows and ALL geometry committed as one manifest. */
  def write(emb: DataFrame, root: String, dim: Int = 64, m: Int = 8,
      k: Int = 16, nCells: Int = 16, buckets: Int = 4): Long = {
    val coarse = IvfIndex.centroids(emb, nCells)
    val book = PqIndex.collectCodebook(emb, k)
    SnapshotStore.commit(encodedRows(emb, coarse, book, dim, m), root,
      buckets, meta = metaLines(coarse, book, dim, m, k) :+
        SnapshotStore.statsDeclaration(Seq("doc_id", "cent_id")))
  }

  /** Insert-or-replace a batch of vectors — the reference's per-vector
    * Pinecone upsert on the compressed layout: assignment AND codes
    * come from the STORED quantizers (appending never re-trains), ids
    * already present are replaced via the store's keyed upsert, and the
    * new rows + carried geometry publish as ONE atomic version under
    * the OCC retry loop. Returns the new version. */
  def upsert(spark: SparkSession, root: String, emb: DataFrame): Long =
    SnapshotStore.withConflictRetry(spark, root) { observed =>
      requirePublished(observed, root, "upsert")
      val (dim, m, k) = storedGeometry(spark, root, observed)
      val coarse = storedCoarse(spark, root, observed)
      val book = storedBook(spark, root, observed)
      IvfIndex.requireDim(emb, coarse, "VersionedIvfAdc.upsert")
      val rows = encodedRows(emb, coarse, book, dim, m)
      SnapshotStore.upsert(spark, rows, rows.select("doc_id"), root,
        bucketsAt(spark, root, observed),
        meta = metaLines(coarse, book, dim, m, k),
        expectedVersion = Some(observed))
    }

  /** Delete vectors by id — one atomic empty-re-ingest publish, geometry
    * carried, doc_id stats pruning the keyed read. */
  def delete(spark: SparkSession, root: String, ids: DataFrame): Long =
    SnapshotStore.withConflictRetry(spark, root) { observed =>
      requirePublished(observed, root, "delete")
      val (dim, m, k) = storedGeometry(spark, root, observed)
      val coarse = storedCoarse(spark, root, observed)
      val book = storedBook(spark, root, observed)
      val empty = SnapshotStore.read(spark, root, observed)
        .drop("bucket").limit(0)
      SnapshotStore.upsert(spark, empty,
        ids.select(col("vec_id").cast("long").as("doc_id")),
        root, bucketsAt(spark, root, observed),
        meta = metaLines(coarse, book, dim, m, k),
        expectedVersion = Some(observed))
    }

  /** The IVFADC cascade against a published version (head by default):
    * coarse probe → candidate cells admitted by ONE
    * [[SnapshotStore.readWhereIn]] metadata pass → PQ asymmetric
    * distance from the broadcast query LUT over the stored codes. The corpus
    * embeddings are never touched — the manifest IS the index. Query
    * ids share the corpus namespace and self-exclude, the
    * [[PqIndex.searchIvfIndexed]] contract. */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      nProbe: Int, topK: Int, version: Long = -1L): DataFrame = {
    val (dim, m, _) = storedGeometry(spark, root, version)
    val coarse = storedCoarse(spark, root, version)
    val book = storedBook(spark, root, version)
    IvfIndex.requireDim(queries, coarse, "VersionedIvfAdc.search")
    val probes = IvfIndex.cellRanksWith(queries, coarse)
      .filter(col("rk") <= nProbe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    // bounded driver pull: queries × nProbe cell ids
    val probeCells = probes.select("cent_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val cells = SnapshotStore.readWhereIn(spark, root, "cent_id",
      probeCells.toIndexedSeq, version)
    // query LUT: subspace distances of the query vectors to the STORED
    // codebook — tiny (queries × m × k), broadcast
    val subDim = dim / m
    val sp = spark
    import sp.implicits._
    val bookRows = book.toSeq.flatMap { case (cid, q) =>
      q.zipWithIndex.map { case (v, pos) =>
        (cid, pos / subDim, pos % subDim, v)
      }
    }.toDF("cent_id", "j", "i", "cv")
    val lut = PqIndex
      .distsAgainst(PqIndex.components(queries, subDim), bookRows)
      .select(col("vec_id").as("q_id"), col("j"),
        col("cent_id").as("code"), col("dist"))
    // asymmetric distance: explode each candidate's code array to
    // (j, code), sum the m LUT lookups, rank per query
    val w = Window.partitionBy("q_id")
      .orderBy(col("approx_dist"), col("vec_id"))
    cells.select(col("doc_id").as("vec_id"), col("cent_id"), col("codes"))
      .join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        posexplode(col("codes")).as(Seq("j", "code")))
      .join(broadcast(lut), Seq("q_id", "j", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dist")).as("approx_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id"), col("approx_dist"))
  }
}

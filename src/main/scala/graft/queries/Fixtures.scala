package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Process-wide memo of deterministic trained-model fixtures shared by
  * several gates.
  *
  * The six LR-evaluation gates (quality / AUC / sliced AUC / PR curve /
  * calibration / curation) all evaluate the SAME model — a deterministic
  * function of (corpus, params) that each gate used to retrain in-gate,
  * so ~2.5 s × 6 of every bench run measured fixture construction, not
  * operator latency (the round-7 bench-honesty watch item). Training now
  * happens once per (session, sf dir): the first caller pays, everyone
  * else reads the frozen ≤(buckets+1)-row weight table back from
  * localCheckpoint blocks. `ext_lr_train` deliberately does NOT use the
  * memo — training is the operator that gate measures.
  *
  * Correctness is unchanged: the DuckDB oracles replay the full unrolled
  * training per gate regardless (SQL is stateless), and a memoized
  * deterministic model hashes identically to a retrained one. Bench runs
  * the [[setups]] thunks OUTSIDE the per-query timed region and reports
  * their cost as `setup` in the artifact, so the suite total reflects
  * operator latency while fixture cost stays visible.
  */
object Fixtures {

  // Keys embed sessionUUID (unique for the session's lifetime, never
  // reused by the JVM), not identityHashCode (which CAN be handed to a
  // later session after GC and would serve fixtures bound to a dead
  // SparkSession). Entries for stopped sessions stay until process exit —
  // fixture frames are model-sized, so the bound is harmless in the
  // single-session Bench/Verify processes these serve.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val pairCache =
    scala.collection.concurrent.TrieMap.empty[String, (DataFrame, DataFrame)]

  /** Stable per-session token: a UUID minted on first sight, held weakly
    * by session identity. Unlike identityHashCode it can never be handed
    * to a later session after GC, and the entry itself evicts with the
    * session. */
  private val tokens =
    new java.util.WeakHashMap[SparkSession, String]()
  private def sessionToken(s: SparkSession): String = tokens.synchronized {
    tokens.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)
  }

  /** The ext_lr_* family's model: LogReg.train on the doc_id%2 slice,
    * y = (lang='en'), B = 1000, T = 3 — the exact spec every gate's
    * oracle unrolls. Frozen via eager localCheckpoint so reuse is a
    * model-sized block read. */
  def lrWeights(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(sessionToken(s) + "|lr|" + dir, {
      graft.ext.LogReg.train(
        Tables.t(s, dir, "documents").where(col("doc_id") % 2 === 0),
        "text", "doc_id", (col("lang") === "en").cast("long"),
        buckets = 1000, iterations = 3)
        .localCheckpoint(eager = true)
    })

  /** The langid upgrade gates' router model: char-trigram NB trained on
    * the DECORATED corpus's doc_id%3 slice (B = 2000, α = 1) — the spec
    * both gates' oracles replay. (model, priors), each frozen via eager
    * localCheckpoint (C×B- and C-sized). */
  def langidDecorModel(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    pairCache.getOrElseUpdate(sessionToken(s) + "|lid|" + dir, {
      val labeled = Ext.langDecorDocs(s, dir)
        .where(col("doc_id") % 3 === 0).select("text", "lang")
      val (m, p) = graft.ext.NaiveBayes.train(
        labeled, "text", "lang", buckets = 2000, alpha = 1.0,
        features = graft.ext.LangId.charGramBuckets(graft.ext.LangId.DefaultN))
      (m.localCheckpoint(eager = true), p.localCheckpoint(eager = true))
    })

  /** The trained IVF codebook consumed by the clustering-quality audit:
    * kmeansCodebook on embeddings (8 cells, 64 dims, 2 Lloyd iterations)
    * — the exact spec `ext_kmeans_train` measures and its oracle unrolls.
    * Frozen via eager localCheckpoint (8×64 floats). */
  def kmeansBook(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(sessionToken(s) + "|km|" + dir, {
      graft.ext.Similarity.kmeansCodebook(
        Tables.t(s, dir, "embeddings"), "embedding", "vec_id",
        nCells = 8, dim = 64, iterations = 2)
        .localCheckpoint(eager = true)
    })

  /** ONE frozen scoring pass over the decorated corpus under the frozen
    * decor model: (doc_id, lang = truth, trained, heuristic). The three
    * langid evaluation gates (confusion / routed quota / Cohen's kappa)
    * are projections of this frame — each used to re-run the same
    * classifyWith + heuristic scan for identical output (the Fleiss
    * shared-pass precedent, 5.0 → 0.44 s). Oracles replay the full
    * score per gate regardless, so correctness is pinned unchanged. */
  def langidDecorScored(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(sessionToken(s) + "|lidscored|" + dir, {
      val docs = Ext.langDecorDocs(s, dir)
      val (m, p) = langidDecorModel(s, dir)
      val trained = graft.ext.LangId.classifyWith(
        docs.select("doc_id", "text"), m, p, "text", "doc_id")
        .select(col("doc_id"), col("lang").as("trained"))
      val heur = graft.ext.TextStats.langId(docs, "text")
        .select(col("doc_id"), col("lang_pred").as("heuristic"))
      docs.select(col("doc_id"), col("lang"))
        .join(trained, "doc_id").join(heur, "doc_id")
        .localCheckpoint(eager = true)
    })

  /** The half-decorated corpus's frozen (top-1, margin, heuristic) pass:
    * (doc_id, lang_top, margin_lpq, heuristic). The abstain-margin gate
    * and the Fleiss three-rater gate project their raters from it. */
  def langidHalfScored(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(sessionToken(s) + "|lidhalf|" + dir, {
      val docs = Ext.langHalfDecorDocs(s, dir)
      val (m, p) = langidDecorModel(s, dir)
      val tm = graft.ext.LangId.classifyTopMargin(
        docs.select("doc_id", "text"), m, p, "text", "doc_id")
      val heur = graft.ext.TextStats.langId(docs, "text")
        .select(col("doc_id"), col("lang_pred").as("heuristic"))
      tm.join(heur, "doc_id").localCheckpoint(eager = true)
    })

  private val storeCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.table.TableStore]

  private def tempStore(s: SparkSession, tag: String): graft.table.TableStore =
    new graft.table.TableStore(s,
      java.nio.file.Files.createTempDirectory(s"graft_fx_$tag").toString)

  /** Frozen persistent-index fixtures. The three `*_indexed` gates measure
    * the QUERY path of a "build once, query many times" index — so the
    * build is fixture construction, paid once per (session, sf) in Bench's
    * untimed setup phase, exactly like the trained models above. The
    * incremental/append/delete gates do NOT use these: index MUTATION is
    * the operator those gates measure, and it needs a private store.
    * Correctness is unchanged — a frozen index serves byte-identical
    * results to one built in-gate (the build is deterministic), and the
    * DuckDB oracles replay the scan-path spec regardless. */
  def bm25IndexStore(s: SparkSession, dir: String): graft.table.TableStore =
    storeCache.getOrElseUpdate(
      sessionToken(s) + "|bm25ix|" + dir, {
        val store = tempStore(s, "bm25")
        graft.ext.Retrieval.buildBm25Index(store, "docs",
          Tables.t(s, dir, "documents"), "text", "doc_id", numBuckets = 8)
        store
      })

  def nearDupIndexStore(s: SparkSession, dir: String): graft.table.TableStore =
    storeCache.getOrElseUpdate(
      sessionToken(s) + "|ndix|" + dir, {
        val store = tempStore(s, "nd")
        graft.ext.NearDupIndex.buildNearDupIndex(store, "nd",
          Tables.t(s, dir, "documents").select(col("doc_id"), col("text")),
          "text", "doc_id", numBuckets = 8)
        store
      })

  def gramIndexStore(s: SparkSession, dir: String): graft.table.TableStore =
    storeCache.getOrElseUpdate(
      sessionToken(s) + "|ngix|" + dir, {
        val store = tempStore(s, "ng")
        graft.ext.GramIndex.buildGramIndex(store, "ng",
          Tables.t(s, dir, "documents").select(col("doc_id"), col("text")),
          "text", n = 8, numBuckets = 8)
        store
      })

  def ivfIndexStore(s: SparkSession, dir: String): graft.table.TableStore =
    storeCache.getOrElseUpdate(
      sessionToken(s) + "|ivfix|" + dir, {
        val store = tempStore(s, "ivf")
        graft.ext.VectorIndex.buildIvfIndex(store, "emb",
          Tables.t(s, dir, "embeddings"), "embedding", "vec_id",
          nCells = 16, numBuckets = 8)
        store
      })

  /** Fixture label -> force-materialization thunk, for Bench's untimed
    * setup phase. Labels are stable artifact keys. */
  val setups: Map[String, (SparkSession, String) => Unit] = Map(
    "lr_weights" -> ((s, dir) => { lrWeights(s, dir).count(); () }),
    "langid_decor_model" -> ((s, dir) => {
      val (m, p) = langidDecorModel(s, dir)
      m.count(); p.count(); ()
    }),
    "kmeans_book" -> ((s, dir) => { kmeansBook(s, dir).count(); () }),
    "langid_decor_scored" -> ((s, dir) => { langidDecorScored(s, dir).count(); () }),
    "langid_half_scored" -> ((s, dir) => { langidHalfScored(s, dir).count(); () }),
    "bm25_index" -> ((s, dir) => { bm25IndexStore(s, dir); () }),
    "neardup_index" -> ((s, dir) => { nearDupIndexStore(s, dir); () }),
    "ivf_index" -> ((s, dir) => { ivfIndexStore(s, dir); () }),
    "gram_index" -> ((s, dir) => { gramIndexStore(s, dir); () })
  )

  /** Which gates consume which fixture — Bench pre-builds exactly the
    * fixtures its selected queries need. */
  val querySetups: Map[String, Seq[String]] = Map(
    "ext_lr_quality" -> Seq("lr_weights"),
    "ext_lr_auc" -> Seq("lr_weights"),
    "ext_lr_auc_sliced" -> Seq("lr_weights"),
    "ext_lr_pr_curve" -> Seq("lr_weights"),
    "ext_lr_calibration" -> Seq("lr_weights"),
    "ext_lr_ece" -> Seq("lr_weights"),
    "ext_curation_e2e" -> Seq("lr_weights"),
    "ext_langid_confusion" -> Seq("langid_decor_model", "langid_decor_scored"),
    "ext_langid_routed_quota" -> Seq("langid_decor_model", "langid_decor_scored"),
    "ext_langid_margin" -> Seq("langid_decor_model", "langid_half_scored"),
    "ext_label_kappa" -> Seq("langid_decor_model", "langid_decor_scored"),
    "ext_fleiss_kappa" -> Seq("langid_decor_model", "langid_half_scored"),
    "ext_bm25_indexed" -> Seq("bm25_index"),
    "ext_neardup_indexed" -> Seq("neardup_index"),
    "ext_ivf_indexed" -> Seq("ivf_index"),
    "ext_novelty_indexed" -> Seq("gram_index"),
    "ext_cluster_quality" -> Seq("kmeans_book")
  )
}

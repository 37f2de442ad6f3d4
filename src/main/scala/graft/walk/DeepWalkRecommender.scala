package graft.walk

import graft.knn.CosineKnn
import graft.model.Recommender
import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DeepWalk / node2vec recommender (SURVEY §2.8 M1-M3, M6): random
  * walks over the user-item(-property) graph, skip-gram embeddings, and
  * exact cosine top-k recommendation.
  *
  * Reference path: `deep_walk_based/model.py:50-122` — int-relabel the
  * graph (graph.py:168-179), `walker.random_walks`, gensim
  * Word2Vec(sg=1, hs=1), then brute kNN + anti-join + top-k cutoff
  * (model.py:54-97). Here: [[graft.graph.KGraph.relabel]],
  * [[RandomWalks]], MLlib Word2Vec (also skip-gram + hierarchical
  * softmax), [[CosineKnn.topK]].
  *
  * cfg keys (YAML `parameters` block, config_files/test.yml:67-74):
  * walk_len, n_walks, p, q, biased, embedding_size, window_size,
  * epochs, learning_rate, min_count, workers, seed. Defaults mirror the
  * reference wrapper's (model.py:20-29): window_size 3, learning_rate
  * 0.05, min_count 1 (all-kept, as gensim min_count=1), workers =
  * local parallelism (`w2v_threads` remains an explicit alias).
  */
class DeepWalkRecommender(cfg: Map[String, String] = Map.empty) extends Recommender {
  private def i(key: String, d: Int) = cfg.get(key).map(_.toInt).getOrElse(d)
  private def f(key: String, d: Double) = cfg.get(key).map(_.toDouble).getOrElse(d)

  /** Reference-format report name (deep_walk_based/model.py:45-48):
    * verbose and parameter-bearing — q before p, as the reference
    * prints it — so two configs of the same model stay distinct rows
    * in one report (run1.csv relies on exactly this). */
  override def name: String =
    "Node2Vec based model + cosine similarity" +
      s";q=${f("q", 1.0)};p=${f("p", 1.0)};embedding_size=${i("embedding_size", 64)}"

  private var spark: SparkSession = _
  private var train: DataFrame = _
  private var userEmb: DataFrame = _ // (id, vec)
  private var itemEmb: DataFrame = _

  override def train(spark: SparkSession, trainRatings: DataFrame,
                     propertyEdges: Option[DataFrame],
                     socialEdges: Option[DataFrame]): Recommender = {
    this.spark = spark
    // persist: train feeds the walk edges here plus the maxRated agg and
    // anti-join in recommend() — without this the (split-derived) lineage
    // re-derives per consumer; released in release()
    this.train = trainRatings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = i("seed", 42)
    import graft.graph.KGraph

    // label-space edges: user-item rating edges, optional
    // (src_label, dst_label) property edges, and optional User–User
    // social links (graph.py:304-314) — the walk graph takes ALL edge
    // kinds; adjacency() symmetrizes, matching the undirected nx.Graph
    val ratingEdges = trainRatings.select(
      KGraph.userLabel(col("user_id")).as("src_label"),
      KGraph.itemLabel(col("item_id")).as("dst_label"))
    val labelEdges = (propertyEdges.toSeq ++ socialEdges.toSeq)
      .map(_.select("src_label", "dst_label"))
      .foldLeft(ratingEdges)(_ unionByName _)
    val nodes = KGraph.relabel(
      labelEdges.select(col("src_label").as("label"))
        .union(labelEdges.select(col("dst_label").as("label"))))
    val intEdges = labelEdges
      .join(nodes.withColumnRenamed("label", "src_label"), Seq("src_label"))
      .withColumnRenamed("node_id", "src")
      .join(nodes.withColumnRenamed("label", "dst_label"), Seq("dst_label"))
      .withColumnRenamed("node_id", "dst")
      .select("src", "dst")

    val adj = RandomWalks.adjacency(intEdges).cache()
    val starts = nodes.select(col("node_id").as("node"))
    val walksRaw =
      if (cfg.get("biased").contains("true"))
        // walk_impl: alias — the extreme-scale per-edge-alias-table
        // kernel (O(1) steps, shuffle-joined tables, nothing broadcast);
        // default stays the class-sampling kernels the q42 golden pins
        if (cfg.get("walk_impl").contains("alias"))
          RandomWalks.biasedWalksAlias(spark, adj, starts, i("n_walks", 10), i("walk_len", 10),
            f("p", 1.0), f("q", 1.0), seed)
        else
          RandomWalks.biasedWalks(spark, adj, starts, i("n_walks", 10), i("walk_len", 10),
            f("p", 1.0), f("q", 1.0), seed)
      else
        RandomWalks.randomWalks(spark, adj, starts, i("n_walks", 10), i("walk_len", 10), seed)
    // pin_order: total-order the corpus by its unique (start, walk_idx)
    // key so the SGNS kernel consumes sentences in a partitioning-
    // independent order — walk CONTENT is already seed-deterministic
    // (q42/q45 goldens), but collect order is partition order, and SGD
    // is order-sensitive. With w2v_threads=1 this makes the embedding
    // fit bit-exact across sessions (golden-parquet oracle, q40).
    val walks = if (cfg.get("pin_order").contains("true"))
      walksRaw.orderBy("start", "walk_idx") else walksRaw

    // trainer dispatch (mirrors KgeTrainer.fitAuto): below the gate the
    // corpus is collected once and trained shared-memory on the driver
    // ([[SkipGram.fit]] — the gensim-shaped kernel, ~5× faster than a
    // broadcast-replica-average cycle at headline scale); above it the
    // corpus stays an RDD and [[SkipGram.fitDistributed]] trains
    // partition replicas + token-weighted averaging — the unbounded-
    // corpus path (model stays driver-sized, as in MLlib). Gate: ≤5e7
    // model params (same bound as KGE) and ≤1e8 corpus tokens (~400 MB
    // of ints on the driver). `w2v_impl` forces a path explicitly
    // (`mllib` keeps the stock MLlib Word2Vec for comparison).
    val nNodes = nodes.count()
    val estTokens = nNodes * i("n_walks", 10).toLong * i("walk_len", 10).toLong
    val impl = cfg.getOrElse("w2v_impl", "auto")
    val useLocal = impl match {
      case "local" => true
      case "mllib" | "distributed" => false
      case _ => 2L * nNodes * i("embedding_size", 64) <= 50000000L && estTokens <= 100000000L
    }
    val nodeVecs =
      if (useLocal)
        SkipGram.fit(spark, walks, vocabSize = nNodes.toInt,
          dim = i("embedding_size", 64), window = i("window_size", 3),
          epochs = i("epochs", 1), lr = f("learning_rate", 0.05),
          negative = i("negative", 5), minCount = i("min_count", 1), seed = seed,
          threads = i("w2v_threads", i("workers", spark.sparkContext.defaultParallelism)))
      else if (impl != "mllib")
        SkipGram.fitDistributed(spark, walks, vocabSize = nNodes.toInt,
          dim = i("embedding_size", 64), window = i("window_size", 3),
          epochs = i("epochs", 1), lr = f("learning_rate", 0.05),
          negative = i("negative", 5), minCount = i("min_count", 1), seed = seed,
          numPartitions = i("w2v_partitions", 0))
      else {
        // persist: Word2Vec.fit scans its input at least twice (vocab pass,
        // then its internal training cache) and the walk lineage recomputes
        // the whole generation kernel per scan — cache once, drop after fit
        val sentences = walks.select(expr("transform(path, x -> cast(x as string))").as("words"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val w2v = new Word2Vec()
          .setInputCol("words").setOutputCol("w2v")
          .setVectorSize(i("embedding_size", 64))
          .setWindowSize(i("window_size", 3))
          .setMaxIter(i("epochs", 1))
          .setStepSize(f("learning_rate", 0.05))
          .setMinCount(i("min_count", 1))
          .setNumPartitions(i("w2v_partitions", 8)) // gensim's workers analogue
          .setSeed(seed)
        val model = w2v.fit(sentences)
        sentences.unpersist(blocking = false)
        model.getVectors
          .select(col("word").cast("long").as("node_id"), vector_to_array(col("vector")).as("vec"))
      }

    // J9 relabel join-back: embeddings keyed by original label
    val emb = nodeVecs.join(nodes, Seq("node_id"))
    // ids stay strings: the reference schema types them string (§1.2)
    userEmb = emb.filter(col("label").startsWith("User("))
      .select(regexp_extract(col("label"), "^User\\((.*)\\)$", 1).as("id"), col("vec"))
      .cache()
    itemEmb = emb.filter(col("label").startsWith("Item("))
      .select(regexp_extract(col("label"), "^Item\\((.*)\\)$", 1).as("id"), col("vec"))
      .cache()
    // materialize the (small) embedding tables, then drop the walk
    // working set so repeated trainings don't accumulate blocks
    userEmb.count(); itemEmb.count()
    adj.unpersist(blocking = false)
    nodes.unpersist(blocking = false) // relabel returns it persisted
    this
  }

  override def recommend(k: Int): DataFrame =
    DeepWalkRecommender.knnRecommend(train, userEmb, itemEmb, k,
      allRecs = cfg.get("all_recs").contains("true"))

  override def recommendUser(user: String, k: Int): DataFrame =
    DeepWalkRecommender.knnRecommendUser(train, userEmb, itemEmb, user, k,
      allRecs = cfg.get("all_recs").contains("true"))

  override def release(): Unit =
    Seq(train, userEmb, itemEmb).filter(_ != null).foreach(_.unpersist(blocking = false))
}

object DeepWalkRecommender {
  def registry: Map[String, Map[String, String] => Recommender] = Map(
    "deepwalk" -> (cfg => new DeepWalkRecommender(cfg)),
    "node2vec" -> (cfg => new DeepWalkRecommender(cfg + ("biased" -> "true"))),
    // the reference's registry name (model2class.py: 'deepwalk_based') —
    // mapped to the BIASED walker so a config's p/q take effect as its
    // author intended (the reference accepts them but never forwards
    // them to its walker; DEVIATIONS row 7). At the p=q=1.0 its shipped
    // configs mostly use, biased == first-order.
    "deepwalk_based" -> (cfg => new DeepWalkRecommender(cfg + ("biased" -> "true")))
  )

  /** Shared kNN recommendation path (J6 + J5 + W7): score k' =
    * min(max_user_rated + k, n_items) nearest items per user
    * (deep_walk_based/model.py:137-149), drop already-rated, keep k.
    * `allRecs` (model.py:75-76,84-86): rank EVERY unrated item instead
    * of cutting at k — used when callers re-rank downstream. */
  def knnRecommend(train: DataFrame, userEmb: DataFrame, itemEmb: DataFrame, k: Int,
                   allRecs: Boolean = false): DataFrame = {
    val maxRated = train.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(max("c")).first().getLong(0)
    val nItems = itemEmb.count()
    val kPrime = if (allRecs) nItems.toInt else math.min(maxRated + k, nItems).toInt
    // item count is in hand — thread it through so the dispatch gate
    // doesn't rescan the (possibly uncached) item side
    val ranked = CosineKnn.topK(userEmb, itemEmb, kPrime, knownItemCount = nItems)
      .withColumnRenamed("query_id", "user_id")
      .join(train.select(col("user_id").cast("string").as("user_id"),
        col("item_id").cast("string").as("item_id")), Seq("user_id", "item_id"), "left_anti")
      .withColumn("rank", row_number().over(
        Window.partitionBy("user_id").orderBy(col("score").desc, col("item_id"))))
    (if (allRecs) ranked else ranked.filter(col("rank") <= k))
      .select("user_id", "item_id", "rank")
  }

  /** Single-user push-down of [[knnRecommend]]
    * (`get_user_recommendation`, deep_walk_based/model.py:84-103): the
    * reference filters to the user's UNRATED items first, then runs kNN
    * with n_neighbors = k over that candidate set. Same here — one query
    * row and a pre-anti-joined item side reach [[CosineKnn.topK]], so
    * every dispatch tier (fused/shuffle-combine/relational) scores a
    * single user instead of ranking all users and slicing after (which
    * is what filter-on-recommend costs at the opaque-RDD tiers, where no
    * Catalyst pushdown can reach below the kernel). Row-identical to the
    * per-user slice of [[knnRecommend]]: the full path's
    * k' = maxRated + k guarantees ≥ k unrated survivors per user, and
    * all kernels share the (score desc, item_id asc) tie-break. */
  def knnRecommendUser(train: DataFrame, userEmb: DataFrame, itemEmb: DataFrame,
                       user: String, k: Int, allRecs: Boolean = false): DataFrame = {
    val query = userEmb.filter(col("id") === lit(user))
    val rated = train.filter(col("user_id").cast("string") === lit(user))
      .select(col("item_id").cast("string").as("id")).distinct()
    val candidates = itemEmb.join(rated, Seq("id"), "left_anti")
    val nCand = candidates.count()
    val kk = if (allRecs) nCand.toInt else math.min(k.toLong, nCand).toInt
    CosineKnn.topK(query, candidates, kk, knownItemCount = nCand, knownQueryCount = 1L)
      .select(col("query_id").as("user_id"), col("item_id"), col("rank"))
  }
}

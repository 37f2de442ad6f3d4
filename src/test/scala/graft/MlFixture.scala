package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seeded generator for an ml-100k-SHAPED rating set at the real
  * cardinalities: 943 users × 1,681 items × exactly 100,000 ratings
  * with the published MovieLens-100k rating-value marginals
  * (1★ 6,110 / 2★ 11,370 / 3★ 27,145 / 4★ 34,174 / 5★ 21,201). The
  * raw ml-100k ratings are not in this container (the reference
  * commits only its processed map/enriched CSVs), so BASELINE.md's
  * quality rows cannot be reproduced exactly; this fixture closes the
  * CARDINALITY half of that gap — the full YAML experiment runs at
  * the reference's true scale and its structural quality relations
  * (node2vec ≫ transE-on-ratings, nDCG@5 > MAP@5) are assertable.
  *
  * Planted structure (all seeded-deterministic, driver-built — it is
  * a fixture): 10 user communities × 10 item genres; each community
  * favors two genres; item popularity is Zipf-tilted. Every user and
  * every item is guaranteed ≥ 1 rating (coverage pre-seeding), and
  * rating values are assigned by GLOBAL affinity rank so the marginals
  * are exact: the 21,201 highest-affinity pairs get 5★, the next
  * 34,174 get 4★, and so on — high ratings concentrate inside
  * community-favored genres, which is what makes the graph learnable.
  */
object MlFixture {

  val NUsers = 943
  val NItems = 1681
  val NRatings = 100000
  /** Published ml-100k value marginals, highest first. */
  val Marginals: Seq[(Double, Int)] =
    Seq(5.0 -> 21201, 4.0 -> 34174, 3.0 -> 27145, 2.0 -> 11370, 1.0 -> 6110)

  def ratings(spark: SparkSession, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val nComm = 10
    def comm(u: Int) = u % nComm
    def genre(i: Int) = i % nComm
    // Zipf-ish popularity over a seeded permutation of item ids
    val itemRank = rnd.shuffle((0 until NItems).toVector)
      .zipWithIndex.toMap // item -> popularity rank (0 = hottest)
    def itemWeight(i: Int) = 1.0 / (itemRank(i) + 20)
    val cumItem = {
      val w = (0 until NItems).map(itemWeight)
      val c = w.scanLeft(0.0)(_ + _).tail.toArray
      (c, c.last)
    }
    def drawItem(): Int = {
      val x = rnd.nextDouble() * cumItem._2
      val idx = java.util.Arrays.binarySearch(cumItem._1, x)
      math.min(NItems - 1, if (idx >= 0) idx else -idx - 1)
    }
    def favored(u: Int, i: Int) =
      genre(i) == comm(u) || genre(i) == (comm(u) + 1) % nComm
    // the interaction GRAPH itself must cluster (real ml-100k users
    // rate within tastes) — popularity-only pair sampling leaves a
    // near-random bipartite graph whose walks embed nothing but
    // popularity (probed: node2vec MAP@5 0.002, below transE): ~80%
    // of a user's draws stay inside the community's two genres
    def drawItemFor(u: Int): Int = {
      var tries = 0
      var i = drawItem()
      while (!favored(u, i) && rnd.nextDouble() < 0.8 && tries < 50) {
        i = drawItem(); tries += 1
      }
      i
    }
    def drawUser(): Int = rnd.nextInt(NUsers) // activity skew via pair rejection only

    val pairs = scala.collection.mutable.LinkedHashSet.empty[(Int, Int)]
    // coverage pre-seed: every item and every user appears
    (0 until NItems).foreach(i => pairs += ((rnd.nextInt(NUsers), i)))
    (0 until NUsers).foreach(u => pairs += ((u, drawItemFor(u))))
    while (pairs.size < NRatings) { val u = drawUser(); pairs += ((u, drawItemFor(u))) }

    def affinity(u: Int, i: Int): Double = {
      val favored = genre(i) == comm(u) || genre(i) == (comm(u) + 1) % nComm
      val noise = {
        val h = scala.util.hashing.MurmurHash3.productHash((u, i, seed))
        (h & 0xffffff).toDouble / 0xffffff
      }
      (if (favored) 2.0 else 0.0) + 1.0 / (1.0 + itemRank(i) / 150.0) + noise
    }
    val ranked = pairs.toVector
      .sortBy { case (u, i) => (-affinity(u, i), u, i) }
    val values = Marginals.flatMap { case (v, n) => Vector.fill(n)(v) }
    require(values.size == NRatings && ranked.size == NRatings)
    val day = 86400000L
    val rows = ranked.zip(values).map { case ((u, i), v) =>
      val ts = 820454400000L + // 1996-01-01, the ml-100k era
        math.floorMod(scala.util.hashing.MurmurHash3.productHash((u, i, 7)).toLong, 300L * day)
      (u.toLong + 1, i.toLong + 1, v, ts)
    }
    import spark.implicits._
    spark.sparkContext.parallelize(rows, 8).toDF("user_id", "item_id", "rating", "ts")
  }

  /** Enriched.csv-shaped property table at the reference's ml-100k
    * coverage rates (`data_integration/metadata.md:66-74`): one row per
    * item, eight DBpedia-property columns, absent values null. Values
    * align with the planted genre structure the way real DBpedia
    * properties align with tastes — subject/director/starring/producer/
    * writer draw from per-genre pools (shared property nodes connect
    * same-genre items), abstract is unique per item (degree-1 noise
    * nodes, like real abstracts), distributor/cinematography are
    * genre-blind pools (cross-genre noise). This is what makes the
    * reference's thesis — `triples: all` beats `triples: ratings` —
    * assertable on the fixture. */
  def enriched(spark: SparkSession, seed: Long = 42L): DataFrame = {
    val nComm = 10
    def genre(i: Int) = i % nComm
    def h(i: Int, tag: Int): Int = math.abs(
      scala.util.hashing.MurmurHash3.productHash((i, tag, seed)))
    // (name, coverage per-mille, pool size within genre; pool < 0 =>
    // genre-blind pool of |pool|; pool == 0 => unique per item)
    val specs = Seq(
      ("subject", 1000, 2), ("abstract", 997, 0), ("starring", 938, 40),
      ("director", 932, 30), ("distributor", 877, -25), ("writer", 832, 25),
      ("producer", 769, 15), ("cinematography", 728, -40))
    val rows = (0 until NItems).map { i =>
      val vals = specs.map { case (name, cov, pool) =>
        if (h(i, name.hashCode) % 1000 >= cov) null
        else if (pool == 0) s"${name}_${i + 1}"
        else if (pool < 0) s"${name}_${h(i, name.hashCode * 31) % -pool}"
        else s"${name}_g${genre(i)}_${h(i, name.hashCode * 31) % pool}"
      }
      (i.toLong + 1, vals(0), vals(1), vals(2), vals(3), vals(4), vals(5), vals(6), vals(7))
    }
    import spark.implicits._
    spark.sparkContext.parallelize(rows, 4).toDF("item_id",
      "subject", "abstract", "starring", "director", "distributor",
      "writer", "producer", "cinematography")
  }
}

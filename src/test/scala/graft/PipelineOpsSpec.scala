package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.util.{AsofJoin, Sampling}
import graft.text.Chunking
import graft.knn.Quantize

/** Value-level semantics of the round-9 pipeline operators: as-of join,
  * chunking, domain mixing, stratified sampling, int8 quantization. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- as-of join ------------------------------------------------------

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long, Double)]) = {
    val l = left.toDF("k", "lid", "ts")
    val r = right.toDF("k", "rid", "ts", "v")
    AsofJoin.asofBackward(l, r, Seq("k"), "ts", "ts", Seq("rid", "v"), "rid")
      .select("k", "lid", "ts", "asof_ts", "asof_rid", "asof_v")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().sortBy(t => (t._1, t._2)).toSeq
  }

  test("asofBackward: latest right row at-or-before each left ts, per key") {
    val out = asof(
      left = Seq((1L, 100L, 10L), (1L, 101L, 25L), (1L, 102L, 5L), (2L, 200L, 50L)),
      right = Seq((1L, 900L, 10L, 1.0), (1L, 901L, 20L, 2.0), (2L, 902L, 60L, 3.0)))
    assert(out == Seq(
      (1L, 100L, 10L, Some(10L), Some(900L), Some(1.0)), // tie: right at == left ts matches
      (1L, 101L, 25L, Some(20L), Some(901L), Some(2.0)),
      (1L, 102L, 5L, None, None, None),                  // nothing earlier -> left outer nulls
      (2L, 200L, 50L, None, None, None)))                // right row is later -> no match
  }

  test("asofBackward: equal right timestamps resolve to the max tiebreak row") {
    val out = asof(
      left = Seq((1L, 100L, 30L)),
      right = Seq((1L, 5L, 20L, 1.0), (1L, 9L, 20L, 2.0), (1L, 7L, 20L, 3.0)))
    assert(out == Seq((1L, 100L, 30L, Some(20L), Some(9L), Some(2.0))))
  }

  test("asofBackward: a NULL payload in the matched row stays NULL (struct carry, no leak-through)") {
    val l = Seq((1L, 100L, 30L)).toDF("k", "lid", "ts")
    val r = Seq((1L, 1L, 10L, Some(7.0)), (1L, 2L, 20L, Option.empty[Double]))
      .toDF("k", "rid", "ts", "v")
    val out = AsofJoin.asofBackward(l, r, Seq("k"), "ts", "ts", Seq("rid", "v"), "rid")
      .select("asof_rid", "asof_v").as[(Option[Long], Option[Double])].collect().toSeq
    // the ts=20 row matches; its null v must NOT fall back to ts=10's 7.0
    assert(out == Seq((Some(2L), None)))
  }

  test("asofBackward matches the sort-merge oracle on a random instance") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i => (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(100).toLong))
    val right = (1 to 200).map(i => (rnd.nextInt(5).toLong, 1000L + i, rnd.nextInt(100).toLong, rnd.nextInt(10).toDouble))
    val expected = left.map { case (k, lid, ts) =>
      val cands = right.filter(r => r._1 == k && r._3 <= ts)
      val best = if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._3, r._2))) // latest ts, then max tiebreak
      (k, lid, ts, best.map(_._3), best.map(_._2), best.map(_._4))
    }.sortBy(t => (t._1, t._2))
    assert(asof(left, right) == expected)
  }

  // --- chunking --------------------------------------------------------

  test("chunk: boundaries, counts, and tail semantics are exact") {
    def mk(n: Int) = ("x" * n)
    val df = Seq((1L, mk(48)), (2L, mk(200)), (3L, mk(350)), (4L, mk(500)), (5L, mk(201)))
      .toDF("doc_id", "text")
    val out = Chunking.chunk(df, "text", 200, 150, Seq("doc_id"))
      .select("doc_id", "chunk_idx", "chunk_chars")
      .as[(Long, Int, Int)].collect().toSeq.sorted
    assert(out == Seq(
      (1L, 0, 48), (2L, 0, 200),
      (3L, 0, 200), (3L, 1, 200),          // [0,200) [150,350)
      (4L, 0, 200), (4L, 1, 200), (4L, 2, 200), // [0,200) [150,350) [300,500)
      (5L, 0, 200), (5L, 1, 51)))          // [150, 201) tail
  }

  test("chunk: every chunk is the exact substring at i*stride") {
    val text = (0 until 433).map(i => ('a' + i % 26).toChar).mkString
    val out = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"), "text", 100, 60, Seq("doc_id"))
      .select("chunk_idx", "chunk_text").as[(Int, String)].collect().toSeq.sortBy(_._1)
    assert(out.size == 7) // (433-41)//60+1 = 7
    out.foreach { case (i, s) =>
      assert(s == text.substring(i * 60, math.min(i * 60 + 100, text.length)))
    }
  }

  // --- domain mixing ---------------------------------------------------

  test("domainMix: alpha<1 upsamples small domains; rates bounded; deterministic") {
    val docs = ((1 to 900).map(i => (i.toLong, "big", 100L)) ++
      (1 to 100).map(i => (1000L + i, "small", 100L)))
      .toDF("doc_id", "source", "n_chars")
    val out = Sampling.domainMix(docs, "source", "n_chars", alpha = 0.5,
      targetFraction = 0.5, seed = 7L, keyCols = Seq("doc_id"))
    val rates = out.select("source", "keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("small") > rates("big"), s"alpha<1 must favor the small domain: $rates")
    assert(rates.values.forall(r => r > 0 && r <= 1))
    // expected keeps: rate * n within binomial noise (md5 is uniform)
    val kept = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("big") - rates("big") * 900) < 90)
    assert(math.abs(kept("small") - rates("small") * 100) < 35)
    val again = Sampling.domainMix(docs, "source", "n_chars", 0.5, 0.5, 7L, Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("domainMix: alpha=1 targetFraction=1 keeps everything (rate clamps to 1)") {
    val docs = (1 to 50).map(i => (i.toLong, s"s${i % 3}", 10L)).toDF("doc_id", "source", "n_chars")
    val out = Sampling.domainMix(docs, "source", "n_chars", 1.0, 1.0, 7L, Seq("doc_id"))
    assert(out.count() == 50)
  }

  // --- stratified sampling ---------------------------------------------

  test("stratifiedTake: exactly min(n, |stratum|) rows per stratum, deterministic") {
    val docs = ((1 to 40).map(i => (i.toLong, "en")) ++ (1 to 3).map(i => (100L + i, "fr")))
      .toDF("doc_id", "lang")
    val out = Sampling.stratifiedTake(docs, Seq("lang"), n = 5, seed = 11L, Seq("doc_id"))
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 5L, "fr" -> 3L))
    val again = Sampling.stratifiedTake(docs, Seq("lang"), 5, 11L, Seq("doc_id"))
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      out.select("doc_id").as[Long].collect().sorted.toSeq)
    // a different seed draws a different sample (overwhelmingly likely at 5-of-40)
    val other = Sampling.stratifiedTake(docs, Seq("lang"), 5, 12L, Seq("doc_id"))
    assert(other.select("doc_id").as[Long].collect().sorted.toSeq !=
      out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  // --- plan shapes (the scale contract) --------------------------------

  test("asofBackward plans as ONE keyed exchange and zero join nodes") {
    val l = (1 to 100).map(i => (i.toLong % 7, i.toLong, i.toLong * 3)).toDF("k", "lid", "ts")
    val r = (1 to 80).map(i => (i.toLong % 7, 1000L + i, i.toLong * 2, i * 1.0)).toDF("k", "rid", "ts", "v")
    val plan = AsofJoin.asofBackward(l, r, Seq("k"), "ts", "ts", Seq("rid", "v"), "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 keyed exchange, got $exchanges:\n$plan")
    assert(plan.contains("Window"))
  }

  test("chunk is map-only: zero exchanges in the physical plan") {
    val docs = (1 to 200).map(i => (i.toLong, "x" * (i % 400 + 10))).toDF("doc_id", "text")
    val plan = Chunking.chunk(docs, "text", 100, 60, Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("shard pays one keyed exchange; stratifiedTake is a group-limited window") {
    val docs = (1 to 500).map(i => (i.toLong, s"l${i % 3}")).toDF("doc_id", "lang")
    val shardPlan = Sampling.shard(docs, 8, 5L, Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(shardPlan).size == 1, shardPlan)
    // low-cardinality strata must NOT funnel an unbounded per-group
    // sort through a single task: the rank cut must ride the
    // WindowGroupLimit partial/final pair (k rows per group cross the
    // exchange), and there must be no RDD boundary (the pre-r14 heap
    // combine's opaque ExistingRDD scan)
    val stratPlan = Sampling.stratifiedTake(docs, Seq("lang"), 5, 11L, Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(stratPlan.contains("WindowGroupLimit"),
      s"expected group-limited ranking, got:\n$stratPlan")
    assert(!stratPlan.contains("ExistingRDD"),
      s"unexpected RDD boundary:\n$stratPlan")
  }

  test("domainMix joins the per-domain rates by broadcast, never sort-merge") {
    val docs = (1 to 500).map(i => (i.toLong, s"s${i % 4}", 10L)).toDF("doc_id", "source", "n_chars")
    val plan = Sampling.domainMix(docs, "source", "n_chars", 0.5, 0.5, 7L, Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join for a domains-sized table:\n$plan")
  }

  // --- shard assignment ------------------------------------------------

  test("shard: balanced, deterministic, contiguous in-shard positions, partitioning-independent") {
    val docs = (1 to 4000).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    val out = Sampling.shard(docs, nShards = 8, seed = 5L, keyCols = Seq("doc_id"))
      .select("doc_id", "shard", "shard_pos")
      .as[(Long, Int, Long)].collect().toSeq
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.values.foreach { rows =>
      assert(math.abs(rows.size - 500) < 120) // md5-uniform, 4000/8 +- binomial noise
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq) // positions 1..n, no gaps
    }
    // repartitioning the input must not move a single row
    val again = Sampling.shard(docs.repartition(17), 8, 5L, Seq("doc_id"))
      .select("doc_id", "shard", "shard_pos").as[(Long, Int, Long)].collect().toSeq
    assert(again.sortBy(_._1) == out.sortBy(_._1))
  }

  // --- quantiles + outlier fences --------------------------------------

  test("groupQuantiles: ANSI percentile_cont interpolation, per group") {
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)) ++
      (1 to 5).map(i => ("b", i.toDouble))).toDF("g", "v")
    val rows = util.Profile.groupQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    // a: pos 0.25*(4-1)=0.75 -> 1 + 0.75*(2-1) = 1.75; median (2+3)/2 = 2.5
    // b: pos 0.25*4=1 -> exactly 2; median 3
    assert(rows(0) == ("a", 1.75, 2.5))
    assert(rows(1) == ("b", 2.0, 3.0))
  }

  test("approxGroupQuantiles tracks the exact quantiles on a smooth group") {
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val exact = util.Profile.groupQuantiles(df, Seq("g"), "v", Seq(0.5, 0.9))
      .collect().head
    val approx = util.Profile.approxGroupQuantiles(df, Seq("g"), "v", Seq(0.5, 0.9))
      .collect().head
    assert(math.abs(exact.getDouble(1) - approx.getDouble(1)) < 20)
    assert(math.abs(exact.getDouble(2) - approx.getDouble(2)) < 20)
  }

  test("iqrOutliers: Tukey fences tag exactly the planted extremes; fences join by broadcast") {
    val base = (1 to 100).map(i => ("g", 50.0 + (i % 11))) // tight cluster
    val planted = Seq(("g", 500.0), ("g", -400.0), ("h", 1.0), ("h", 2.0), ("h", 3.0))
    val df = (base ++ planted).toDF("g", "v")
    val out = util.Profile.iqrOutliers(df, Seq("g"), "v")
    val outliers = out.filter(col("is_outlier")).select("g", "v")
      .as[(String, Double)].collect().toSet
    assert(outliers == Set(("g", 500.0), ("g", -400.0)))
    assert(out.count() == 105) // tagging, not dropping
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"fence join must broadcast:\n$plan")
  }

  // --- URL extraction ---------------------------------------------------

  test("UrlOps: extraction spans, domain normalization, trailing-slash and case rules") {
    import graft.text.UrlOps
    val df = Seq(
      (1L, "plain text, no links"),
      (2L, "x https://WWW.Example.COM/A/b?q=1 y http://sub.dom-ain.org/ z"),
      (3L, "edge (https://a.b/c). trailing http://x.y")).toDF("id", "text")
    val out = df.select(col("id"),
      UrlOps.extractUrls(col("text")).as("urls"),
      transform(UrlOps.extractUrls(col("text")), u => UrlOps.normalizeUrl(u)).as("norm"),
      transform(UrlOps.extractUrls(col("text")), u => UrlOps.domainOf(u)).as("doms"))
      .as[(Long, Seq[String], Seq[String], Seq[String])].collect().sortBy(_._1)
    assert(out(0)._2.isEmpty)
    assert(out(1)._2 == Seq("https://WWW.Example.COM/A/b?q=1", "http://sub.dom-ain.org/"))
    // host lowercased, path case preserved, trailing slash stripped
    assert(out(1)._3 == Seq("https://www.example.com/A/b?q=1", "http://sub.dom-ain.org"))
    assert(out(1)._4 == Seq("example.com", "sub.dom-ain.org")) // www. stripped
    // ')' and '.' terminate the path sensibly; a bare host still matches
    assert(out(2)._2 == Seq("https://a.b/c", "http://x.y"))
  }

  // --- SRP-LSH ANN ------------------------------------------------------

  private def srpVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
  }

  test("SrpLsh buckets match a pure-Scala replay of the integer index math") {
    import graft.knn.SrpLsh
    val dim = 16
    val data = srpVecs(40, dim, 7)
    val df = data.toDF("id", "vec")
    val got = SrpLsh.buckets(df, "id", "vec", dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    def quantizeRef(v: Array[Double]): Array[Int] = {
      val scale = v.map(math.abs).max / 127
      if (scale == 0) Array.fill(v.length)(0)
      else v.map { x =>
        val r = BigDecimal.valueOf(x / scale)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
        math.max(-127, math.min(127, r))
      }
    }
    val expected = data.flatMap { case (id, v) =>
      val q = quantizeRef(v)
      (0 until SrpLsh.NTables).map { t =>
        val bucket = (0 until SrpLsh.NBits).map { b =>
          val s = (0 until dim)
            .map(d => SrpLsh.planeWeight(((t * SrpLsh.NBits + b) * dim + d).toLong) * q(d).toLong)
            .sum
          if (s > 0) 1L << b else 0L
        }.sum
        (id, t) -> bucket
      }
    }.toMap
    assert(got == expected)
  }

  test("SrpLsh: an exact duplicate shares every bucket — its twin is always rank-1 at cos 1") {
    val dim = 16
    val base = srpVecs(30, dim, 11)
    val dups = base.take(5).map { case (id, v) => (100L + id, v.clone()) }
    val items = (base ++ dups).toDF("id", "vec")
    val queries = dups.toDF("id", "vec")
    val out = graft.knn.SrpLsh.srpTopK(queries, items, dim, k = 1, excludeSelf = true)
      .select("query_id", "item_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(out.map(t => (t._1, t._2)) == dups.map { case (qid, _) => (qid, qid - 100L) },
      s"each duplicate's nearest candidate must be its identical twin: $out")
  }

  test("SrpLsh: candidate join keys on (table, bucket) — no cartesian") {
    val dim = 16
    val e = srpVecs(50, dim, 3).toDF("id", "vec")
    val plan = graft.knn.SrpLsh.srpTopK(e.filter(col("id") < 10), e, dim, 3, excludeSelf = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"SRP candidate generation must stay keyed:\n$plan")
  }

  // --- int8 quantization -----------------------------------------------

  test("int8: scale, clamped codes, zero-vector sentinel, bounded reconstruction error") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 127.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-0.001f, 0.001f, 0.0005f, 0.0f))).toDF("vec_id", "embedding")
    val out = Quantize.int8(df, "embedding")
      .select("vec_id", "scale", "qvec", "quant_rmse")
      .as[(Long, Double, Seq[Int], Double)].collect().sortBy(_._1)

    val (_, s1, q1, e1) = out(0)
    assert(s1 == 1.0)                      // max|x| = 127 -> scale 1
    assert(q1 == Seq(1, -2, 1, 127))       // round(0.5) half-up -> 1
    assert(q1.forall(q => q >= -127 && q <= 127))
    assert(e1 <= s1 / 2 + 1e-12)           // per-element error <= scale/2 pre-clamp

    val (_, s2, q2, e2) = out(1)
    assert(s2 == 0.0 && q2 == Seq(0, 0, 0, 0) && e2 == 0.0)

    val (_, s3, q3, _) = out(2)
    assert(math.abs(s3 - 0.001f.toDouble / 127) < 1e-12)
    assert(q3.head == -127 && q3(1) == 127) // extremes hit +/-127 exactly
  }

  // --- perceptual image hash -------------------------------------------

  test("patchFeatures: exact tile sums vs the pixel formula; ragged edges; bad bytes dropped") {
    import graft.multimodal.MultimodalOps
    import spark.implicits._
    // 16x16, 4x4 patches: recompute each tile from the synthetic formula
    val media = Seq(7L, 8L).toDS().map(id => MultimodalOps.Media(
      id, "image", MultimodalOps.syntheticPng(id, 16, 16), 16, 16, 0))
    val got = MultimodalOps.patchFeatures(media, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 2 * 16)
    for (id <- Seq(7L, 8L); pi <- 0 until 16) {
      val vals = for {
        y <- (pi / 4) * 4 until (pi / 4) * 4 + 4
        x <- (pi % 4) * 4 until (pi % 4) * 4 + 4
      } yield 3L * ((id * 31 + (y * 16 + x)) % 256)
      assert(got((id, pi)) == ((vals.sum, vals.min, vals.max)), s"tile $id/$pi")
    }
    // ragged edge: 10x6 with patch 4 -> 3x2 grid, last column 2 wide,
    // last row 2 tall; total pixel mass conserved across tiles
    val ragged = Seq(3L).toDS().map(id => MultimodalOps.Media(
      id, "image", MultimodalOps.syntheticPng(id, 10, 6), 10, 6, 0))
    val rg = MultimodalOps.patchFeatures(ragged, 4).collect()
    assert(rg.length == 6)
    val total = (0 until 60).map(p => 3L * ((3L * 31 + p) % 256)).sum
    assert(rg.map(_.getLong(2)).sum == total, "ragged tiles lost pixels")
    // non-decodable bytes produce no rows (dropped, not a crash)
    val bad = Seq(9L).toDS().map(id =>
      MultimodalOps.Media(id, "image", "not an image".getBytes, 0, 0, 0))
    assert(MultimodalOps.patchFeatures(bad, 4).isEmpty)
  }

  test("aHash64: deterministic, identity for equal images, uniform image -> all zero bits") {
    import graft.multimodal.MultimodalOps
    val a = MultimodalOps.aHash64(MultimodalOps.syntheticPng(7L, 16, 16)).get
    val b = MultimodalOps.aHash64(MultimodalOps.syntheticPng(7L, 16, 16)).get
    assert(a == b && a.length == 64 && a.forall(c => c == '0' || c == '1'))
    // uniform gray: 64*v == total for every pixel, strict > never fires
    val bi = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 64).foreach(p => bi.setRGB(p % 8, p / 8, 0x808080))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    assert(MultimodalOps.aHash64(bos.toByteArray).get == "0" * 64)
    assert(MultimodalOps.aHash64("not an image".getBytes).isEmpty)
  }

  test("aHash64: near-identical images land at small Hamming distance, distinct ones far") {
    import graft.multimodal.MultimodalOps
    def png(id: Long, tweak: Boolean): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 256).foreach { p =>
        val g0 = ((id * 31 + p) % 256).toInt
        val g = if (tweak && p == 0) (g0 + 8) % 256 else g0
        bi.setRGB(p % 16, p / 16, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", bos)
      bos.toByteArray
    }
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    val base = MultimodalOps.aHash64(png(9L, tweak = false)).get
    val near = MultimodalOps.aHash64(png(9L, tweak = true)).get
    val far = MultimodalOps.aHash64(png(10000L, tweak = false)).get
    assert(ham(base, near) <= 2, s"one tweaked pixel flipped ${ham(base, near)} bits")
    assert(ham(base, far) > 8)
  }

  // ---- Sampling.groupSplit -------------------------------------------

  test("groupSplit: every row of a group lands on one side; fractions roughly honored") {
    val df = (1 to 20000).map(i => (i.toLong, s"dom${i % 500}")).toDF("id", "g")
    val out = Sampling.groupSplit(df, "g", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), 7L)
    // leakage guard: one distinct split per group
    assert(out.groupBy("g").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") =!= 1).count() == 0)
    // group-level fractions approximate the targets (binomial over 500 groups)
    val bys = out.select("g", "split").distinct()
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bys("train") - 400L) < 60, bys.toString)
    assert(bys.values.sum == 500L)
    // deterministic; seed-sensitive
    val again = Sampling.groupSplit(df, "g", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), 7L)
    assert(out.select("id", "split").except(again.select("id", "split")).count() == 0)
    val other = Sampling.groupSplit(df, "g", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), 8L)
    assert(other.select("id", "split").except(out.select("id", "split")).count() > 0)
  }

  test("groupSplit: bad fractions rejected") {
    val df = Seq((1L, "a")).toDF("id", "g")
    assertThrows[IllegalArgumentException](
      Sampling.groupSplit(df, "g", Seq(("a", 0.5), ("b", 0.4)), 1L))
    assertThrows[IllegalArgumentException](
      Sampling.groupSplit(df, "g", Seq(("a", 1.5), ("b", -0.5)), 1L))
  }

  test("groupKFold: every group entirely inside one fold, folds span 1..k, deterministic") {
    val df = (0 until 400).map(i => (i.toLong, s"g${i % 37}")).toDF("id", "g")
    val out = Sampling.groupKFold(df, "g", 4, 9L)
      .collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.forall(x => x._2 >= 1 && x._2 <= 4))
    out.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.map(_._2).distinct.length == 1, s"group $g straddles folds")
    }
    assert(out.map(_._2).distinct.sorted.length >= 3, "37 groups should hit >= 3 of 4 folds")
    val again = Sampling.groupKFold(df, "g", 4, 9L)
      .collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq == again.toSeq)
  }
}

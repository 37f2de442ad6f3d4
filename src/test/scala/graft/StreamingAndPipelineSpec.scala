package graft

import graft.multimodal.MultimodalOps
import graft.stream.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingAndPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming windowed agg over events == batch result (incremental parity)") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStreams.windowedAgg(Tables.events(spark, dir), "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    // file stream sources need a directory, not a single file
    val streamDir = java.nio.file.Files.createTempDirectory("graftstream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$dir/events.parquet"), streamDir.resolve("events.parquet"))
    val stream = EventStreams.readEvents(spark, streamDir.toString)
    val q = EventStreams.windowedAgg(stream, "1 hour", watermark = Some("2 hours"))
      .writeStream.outputMode("complete").format("memory").queryName("winagg").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("winagg")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stateful sessionization groups events by inactivity gap") {
    import EventStreams.{Event, Session}
    def ts(min: Long) = new java.sql.Timestamp(min * 60000)
    val events = Seq(
      Event(1, ts(0), 1L, "click", 1.0),
      Event(2, ts(5), 1L, "click", 2.0),
      Event(3, ts(60), 1L, "click", 3.0), // > 30 min gap -> new session
      Event(4, ts(0), 2L, "view", 1.0)
    ).toDS()
    // batch mode: flatMapGroupsWithState processes each group once;
    // only closed sessions are emitted, the last stays in state — so we
    // validate the session-splitting logic on the emitted prefix.
    val sessions = EventStreams.sessionize(events, 30 * 60000)
    val u1 = sessions.filter(_.user_id == 1L).collect()
    assert(u1.length == 1) // first session closed by the 60-min event
    assert(u1.head.n_events == 2 && u1.head.total_value == 3.0)
  }

  test("streaming sessionize: event-time timeout emits the final session (no crash)") {
    // Round-1 regression: the hasTimedOut invocation re-armed the timer with
    // a timestamp already behind the watermark, so the first session timeout
    // threw IllegalArgumentException and killed the query.
    import EventStreams.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000)
    // offset from epoch 0: a row whose event time equals the initial
    // watermark (0) is discarded as late data before reaching the operator
    def m(min: Long) = ts(1000 + min)
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(
      input.toDS().withWatermark("ts", "10 minutes"), 30 * 60000)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess_stream").start()
    try {
      input.addData(Event(1, m(0), 1L, "click", 1.0), Event(2, m(5), 1L, "click", 2.0))
      q.processAllAvailable() // watermark -> m(-5)
      input.addData(Event(3, m(120), 2L, "view", 1.0))
      q.processAllAvailable() // watermark -> m(110) after this batch
      input.addData(Event(4, m(125), 2L, "view", 1.0))
      q.processAllAvailable() // batch runs with wm=110 > 5+30 -> user 1 timer fires
      val u1 = spark.table("sess_stream").as[EventStreams.Session]
        .collect().filter(_.user_id == 1L)
      assert(u1.length == 1 && u1.head.n_events == 2 && u1.head.total_value == 3.0)
    } finally q.stop()
  }

  test("dedupEvents: streaming watermark dedup == batch dedup on the same data") {
    import EventStreams.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(min: Long) = new java.sql.Timestamp((1000 + min) * 60000)
    // event 1 redelivered twice (same event_id), once in the same batch
    // and once a later batch still inside the watermark horizon
    val rows = Seq(
      Event(1, m(0), 1L, "click", 1.0), Event(1, m(0), 1L, "click", 1.0),
      Event(2, m(5), 1L, "view", 2.0), Event(3, m(6), 2L, "click", 3.0))
    val late = Event(1, m(1), 1L, "click", 1.0)

    val batch = EventStreams.dedupEvents(
      (rows :+ late).toDS().toDF(), Seq("event_id"), "30 minutes")
      .select("event_id").as[Long].collect().sorted
    assert(batch.toSeq == Seq(1L, 2L, 3L))

    val input = MemoryStream[Event]
    val q = EventStreams.dedupEvents(input.toDS().toDF(), Seq("event_id"), "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(late) // redelivery in a later trigger: state still live
      q.processAllAvailable()
      val streamed = spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("asofEnrich: streaming point-in-time enrich == batch asofBackward on the same events") {
    import EventStreams.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(min: Long) = new java.sql.Timestamp((1000 + min) * 60000)
    val trigger1 = Seq( // shuffled within the trigger: order must not matter
      Event(1, m(5), 1L, "click", 0.0),     // matches purchase 10
      Event(10, m(0), 1L, "purchase", 5.0),
      Event(4, m(7), 2L, "click", 0.0))     // no purchase yet -> nulls
    val trigger2 = Seq(
      Event(2, m(20), 1L, "click", 0.0),    // tie: purchase 11 at SAME ts matches
      Event(11, m(20), 1L, "purchase", 6.0),
      Event(12, m(8), 2L, "purchase", 7.0), // late right, before user 2's next left
      Event(3, m(25), 1L, "click", 0.0),
      Event(5, m(26), 2L, "click", 0.0))    // matches 12

    val all = (trigger1 ++ trigger2).toDS()
    val batch = graft.util.AsofJoin.asofBackward(
      all.filter(col("event_type") === "click").toDF(),
      all.filter(col("event_type") === "purchase").toDF(),
      Seq("user_id"), "ts", "ts", Seq("event_id", "value"), "event_id")
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(batch == Map(1L -> Some(10L), 2L -> Some(11L), 3L -> Some(11L),
      4L -> None, 5L -> Some(12L)))

    val input = MemoryStream[Event]
    val q = EventStreams.asofEnrich(
      input.toDS().withWatermark("ts", "30 minutes"), "click", "purchase")
      .writeStream.outputMode("append").format("memory").queryName("asof_stream").start()
    try {
      input.addData(trigger1: _*)
      q.processAllAvailable()
      input.addData(trigger2: _*)
      q.processAllAvailable()
      val streamed = spark.table("asof_stream")
        .select(col("event_id"), col("asof_event_id"))
        .as[(Long, Option[Long])].collect().toMap
      assert(streamed == batch,
        s"stream and batch as-of disagree: $streamed vs $batch")
    } finally q.stop()
  }

  test("asofEnrich in batch mode equals asofBackward on a random instance") {
    import EventStreams.Event
    val rnd = new scala.util.Random(9)
    val events = (1 to 400).map { i =>
      Event(i.toLong, new java.sql.Timestamp(60000000L + rnd.nextInt(50) * 60000L),
        rnd.nextInt(6).toLong, if (rnd.nextBoolean()) "click" else "purchase", rnd.nextInt(100).toDouble)
    }
    val ds = events.toDS()
    val viaState = EventStreams.asofEnrich(ds, "click", "purchase")
      .select(col("event_id"), col("asof_event_id"), col("asof_value"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    val viaJoin = graft.util.AsofJoin.asofBackward(
      ds.filter(col("event_type") === "click").toDF(),
      ds.filter(col("event_type") === "purchase").toDF(),
      Seq("user_id"), "ts", "ts", Seq("event_id", "value"), "event_id")
      .select(col("event_id"), col("asof_event_id"), col("asof_value"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(viaState == viaJoin)
  }

  test("labelJoin: watermarked stream-stream interval join == batch on the same pairs") {
    import EventStreams.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(min: Long) = new java.sql.Timestamp((1000 + min) * 60000)
    val views = Seq(
      Event(10, m(0), 1L, "view", 0.0), Event(11, m(40), 1L, "view", 0.0),
      Event(12, m(0), 2L, "view", 0.0))
    val clicks = Seq(
      Event(20, m(10), 1L, "click", 1.0), // pairs with 10 (lag 10 min)
      Event(21, m(45), 1L, "click", 1.0), // pairs with 11 only (45 > 30 from 10's view)
      Event(22, m(200), 2L, "click", 1.0)) // beyond horizon for 12
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val batch = EventStreams.labelJoin(
      views.toDS().toDF(), clicks.toDS().toDF(), "30 minutes").collect().map(key).toSet
    assert(batch.map(p => (p._1, p._2)) == Set((10L, 20L), (11L, 21L)))
    assert(batch.forall { case (_, _, _, lag) => lag > 0 && lag <= 30 * 60000 })

    val vIn = MemoryStream[Event]; val cIn = MemoryStream[Event]
    val q = EventStreams.labelJoin(vIn.toDS().toDF(), cIn.toDS().toDF(),
        "30 minutes", watermark = Some("10 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("labeljoin").start()
    try {
      // outcomes arrive across triggers; inner-join state held under the
      // watermark + horizon bound pairs them when both sides are present
      vIn.addData(views: _*)
      q.processAllAvailable()
      cIn.addData(clicks: _*)
      q.processAllAvailable()
      val streamed = spark.table("labeljoin").collect().map(key).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("labeledExposures: binary labels, counts, earliest lag; negatives kept") {
    import EventStreams.Event
    def m(min: Long) = new java.sql.Timestamp((1000 + min) * 60000)
    val views = Seq(
      Event(10, m(0), 1L, "view", 0.0),   // two clicks inside horizon
      Event(11, m(40), 1L, "view", 0.0),  // one click (lag 5 min)
      Event(12, m(0), 2L, "view", 0.0))   // negative
    val clicks = Seq(
      Event(20, m(10), 1L, "click", 1.0), Event(21, m(20), 1L, "click", 1.0),
      Event(22, m(45), 1L, "click", 1.0), Event(23, m(200), 2L, "click", 1.0))
    val out = EventStreams.labeledExposures(
        views.toDS().toDF(), clicks.toDS().toDF(), "30 minutes")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(3), r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    assert(out(10L) == ((1, 2L, 10 * 60000L))) // clicks 20/21 in horizon; 22 (min 45) out
    assert(out(11L) == ((1, 1L, 5 * 60000L)))
    assert(out(12L) == ((0, 0L, -1L))) // negative row kept, null lag
  }

  test("real image decode: javax.imageio roundtrip matches the pixel formula; non-images fall back to the stub") {
    import graft.multimodal.MultimodalOps
    // synthetic 8×8 gray PNG for id=7: pixel p has gray (7·31+p) mod 256
    val png = MultimodalOps.syntheticPng(7L, 8, 8)
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val feats = MultimodalOps.decodeImage(png, 4).get
    val expected = Array.tabulate(4) { b =>
      val s = (0 until 64).filter(_ % 4 == b).map(p => 3L * ((7L * 31 + p) % 256)).sum
      (s / 765.0).toFloat
    }
    assert(feats.toSeq == expected.toSeq)
    // nearest-neighbor resize: dst (x, y) reads src (2x, 2y) exactly
    val small = MultimodalOps.resizeNearest(png, 4, 4).get
    val smallFeats = MultimodalOps.decodeImage(small, 4).get
    val expectedSmall = Array.tabulate(4) { b =>
      val s = (0 until 16).filter(_ % 4 == b)
        .map(p => 3L * ((7L * 31 + 16 * (p / 4) + 2 * (p % 4)) % 256)).sum
      (s / 765.0).toFloat
    }
    assert(smallFeats.toSeq == expectedSmall.toSeq)
    assert(MultimodalOps.resizeNearest("junk".getBytes, 4, 4).isEmpty)
    // bytes that aren't an image: decodeImage declines, extractFeatures
    // falls back to the deterministic stub (q38 fixtures stay intact)
    assert(MultimodalOps.decodeImage("not a png".getBytes, 4).isEmpty)
    // a valid magic number with a malformed body makes the JDK readers
    // throw RuntimeExceptions, not IOException — still None, never a
    // failed task
    assert(MultimodalOps.decodeImage("GIF89a then garbage".getBytes, 4).isEmpty)
    assert(MultimodalOps.decodeImage(png.take(30), 4).isEmpty) // truncated PNG
    val docs = Seq((1L, "plain text")).toDF("doc_id", "text")
    val viaStub = MultimodalOps.extractFeatures(MultimodalOps.asMedia(docs), 4).collect().head
    assert(viaStub.features.toSeq ==
      MultimodalOps.decodeStub("plain text".getBytes("UTF-8"), 4).toSeq)
  }

  test("multimodal plumbing: deterministic stub features, frame sampling") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val media = MultimodalOps.asMedia(docs)
    val feats = MultimodalOps.extractFeatures(media, dim = 4).collect()
    val byId = feats.map(f => f.id -> f.features.toSeq).toMap
    assert(byId(1L) == byId(2L)) // same bytes -> same fake features
    assert(byId(1L) != byId(3L))
    assert(feats.forall(_.n_bytes > 0))
    val frames = MultimodalOps.sampleFrames(media, 1)
    assert(frames.count() == 3) // tiny payloads -> 1 frame each
  }

  test("Experiment CLI wires social links + user property edges (graph.py:271-314)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftsocial")
    val ratings = new StringBuilder("user_id::string,item_id::string,rating::number,timestamp::number\n")
    for (u <- 1 to 5; i <- 1 to 6) ratings.append(s"u$u,i$i,${(u + i) % 5 + 1},${u * 100 + i}\n")
    java.nio.file.Files.writeString(tmp.resolve("rating.csv"), ratings.toString)
    val userCsv = new StringBuilder("user_id::string,country::string\n")
    for (u <- 1 to 5) userCsv.append(s"u$u,C${u % 2}\n")
    java.nio.file.Files.writeString(tmp.resolve("user.csv"), userCsv.toString)
    // one pair with an unknown endpoint: must be dropped by validation
    java.nio.file.Files.writeString(tmp.resolve("social.csv"),
      "user1::string,user2::string\nu1,u2\nu2,u3\nu1,u9\n")
    val dataset =
      s"""    ratings: {path: ${tmp.resolve("rating.csv")}}
         |    user:
         |      path: ${tmp.resolve("user.csv")}
         |      extra_features: [country]
         |    social: {path: ${tmp.resolve("social.csv")}}""".stripMargin
    val config =
      s"""experiment:
         |  dataset:
         |$dataset
         |  split:
         |    seed: 42
         |    test: {method: k_fold, k: 2, level: user}
         |  models:
         |    - name: deepwalk
         |      parameters: {n_walks: 2, walk_len: 4, embedding_size: 8, epochs: 1, seed: 7}
         |  evaluation: {k: 3, relevance_threshold: 3, metrics: [MAP]}
         |""".stripMargin
    val cfgPath = tmp.resolve("config.yml")
    java.nio.file.Files.writeString(cfgPath, config)

    // graph assembly: user extra_features become User -is-> Property
    // edges; social pairs are endpoint-validated User–User edges
    val root = new org.yaml.snakeyaml.Yaml()
      .load(new java.io.FileInputStream(cfgPath.toString))
      .asInstanceOf[java.util.Map[String, Object]]
    val ds = root.get("experiment").asInstanceOf[java.util.Map[String, Object]]
      .get("dataset").asInstanceOf[java.util.Map[String, Object]]
    val bundle = graft.cli.Experiment.loadDataset(spark, ds)
    val props = bundle.propertyEdges.get.collect()
    assert(props.length == 5 && props.forall(_.getString(1) == "is"))
    assert(props.exists(_.getString(2) == "Property(C1, country)"))
    val social = bundle.socialEdges.get.collect()
    assert(social.map(r => (r.getString(0), r.getString(2))).toSet ==
      Set("User(u1)" -> "User(u2)", "User(u2)" -> "User(u3)")) // u9 pair dropped
    // +social changes the walk graph: the label-edge union the walk model
    // consumes grows by exactly the validated social pairs
    val nRating = bundle.ratings.count()
    assert(nRating + props.length + social.length == 30 + 5 + 2)

    // e2e: the deepwalk model trains on the social-augmented graph
    val report = graft.cli.Experiment.run(spark, cfgPath.toString)
    assert(report.count() == 1)
  }

  test("Experiment CLI honors a nested validation split (dataloader.py:32-40)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftval")
    val ratings = new StringBuilder("user_id::string,item_id::string,rating::number,timestamp::number\n")
    for (u <- 1 to 5; i <- 1 to 8) ratings.append(s"u$u,i$i,${(u + i) % 5 + 1},${u * 100 + i}\n")
    java.nio.file.Files.writeString(tmp.resolve("rating.csv"), ratings.toString)
    val config =
      s"""experiment:
         |  dataset: {ratings: ${tmp.resolve("rating.csv")}}
         |  split:
         |    seed: 42
         |    test: {method: k_fold, k: 2, level: user}
         |    validation: {p: 0.25, level: user}
         |  models:
         |    - {name: popularity, parameters: {}}
         |  evaluation: {k: 3, relevance_threshold: 3, metrics: [MAP]}
         |""".stripMargin
    val cfgPath = tmp.resolve("config.yml")
    java.nio.file.Files.writeString(cfgPath, config)
    val report = graft.cli.Experiment.run(spark, cfgPath.toString)
    assert(report.count() == 1) // runs end-to-end with the carved train set

    // validation accepts the full splitter method surface (dataloader.py
    // dispatches split_config['validation'] through a second EdgeSplitter)
    val cfgTs = config.replace("validation: {p: 0.25, level: user}",
      "validation: {method: timestamp_by_ratio, p: 0.25, level: user}")
    java.nio.file.Files.writeString(tmp.resolve("config_ts.yml"), cfgTs)
    assert(graft.cli.Experiment.run(spark, tmp.resolve("config_ts.yml").toString).count() == 1)

    // k_fold validation under a k_fold test split raises the reference's
    // exact error (dataloader.py:33-34)
    val cfgKk = config.replace("validation: {p: 0.25, level: user}",
      "validation: {method: k_fold, k: 2, level: user}")
    java.nio.file.Files.writeString(tmp.resolve("config_kk.yml"), cfgKk)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Experiment.run(spark, tmp.resolve("config_kk.yml").toString)
    }
    assert(err.getMessage.contains("Validation split does not support k_fold method."))
  }

  test("Experiment CLI: YAML config -> report CSV end-to-end (§3.1)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftexp")
    // typed-header fixtures: 6 users × 6 items, plus a <k-core user
    val ratings = new StringBuilder("user_id::string,item_id::string,rating::number,timestamp::number\n")
    for (u <- 1 to 6; i <- 1 to 6 if (u + i) % 7 != 0)
      ratings.append(s"u$u,i$i,${(u * i) % 5 + 1},${u * 100 + i}\n")
    ratings.append("u9,i1,5,42\n") // user with a single rating: killed by k-core
    java.nio.file.Files.writeString(tmp.resolve("rating.csv"), ratings.toString)
    // enriched table: every item shares property P (graph densifier)
    val enriched = new StringBuilder("item_id::string,subject::string_list\n")
    for (i <- 1 to 6) enriched.append(s"i$i,P${i % 2}::Q\n")
    java.nio.file.Files.writeString(tmp.resolve("enriched.csv"), enriched.toString)
    val config =
      s"""experiment:
         |  dataset:
         |    ratings: ${tmp.resolve("rating.csv")}
         |    enrich:
         |      enriched_path: ${tmp.resolve("enriched.csv")}
         |      properties:
         |        - {type: subject, grouped: true, sep: "::"}
         |  preprocess:
         |    - method: filter_kcore
         |      parameters: {k: 2, target: user, iterations: 1}
         |  split:
         |    seed: 42
         |    test: {method: k_fold, k: 2, level: user}
         |  models:
         |    - name: popularity
         |      parameters: {}
         |  evaluation:
         |    k: 3
         |    relevance_threshold: 3
         |    metrics: [MAP, nDCG]
         |  report:
         |    file: ${tmp.resolve("report")}
         |    execution_times:
         |      file: ${tmp.resolve("times")}
         |""".stripMargin
    val cfgPath = tmp.resolve("config.yml")
    java.nio.file.Files.writeString(cfgPath, config)

    val report = graft.cli.Experiment.run(spark, cfgPath.toString)
    val cols = report.columns.toSet
    assert(cols.contains("model"))
    assert(cols.contains("fold-1_MAP@3") && cols.contains("fold-2_MAP@3"))
    assert(cols.contains("MAP@3_mean") && cols.contains("MAP@3_std"))
    assert(cols.contains("nDCG@3_mean") && cols.contains("execution_time_mean"))
    // separate execution-times CSV embeds the machine spec in the model
    // name (report.py:99)
    val times = spark.read.option("header", "true")
      .csv(tmp.resolve("times").toString).collect()
    assert(times.length == 1 && times.head.getString(0).startsWith("popularity (CPU: "))
    assert(times.head.getString(0).contains("RAM: ") && times.head.getString(0).endsWith("GPUs: [])"))
    val row = report.first()
    assert(row.getString(row.fieldIndex("model")) == "popularity")
    val mapMean = row.getDouble(row.fieldIndex("MAP@3_mean"))
    assert(mapMean >= 0.0 && mapMean <= 1.0)
    // report CSV landed on disk in the reference's artifact shape
    // (report.py:31-63): fold-major metric columns, then mean/std pairs,
    // and NO execution_time columns (those live in the times file)
    val reportHeader = spark.read.option("header", "true")
      .csv(tmp.resolve("report").toString).columns.toSeq
    assert(reportHeader == Seq("model",
      "fold-1_MAP@3", "fold-1_nDCG@3", "fold-2_MAP@3", "fold-2_nDCG@3",
      "MAP@3_mean", "MAP@3_std", "nDCG@3_mean", "nDCG@3_std"),
      s"report artifact header mismatch: $reportHeader")
  }

  test("enrich block reference parity: enrich_path key, string properties, map URI edges, remove_unmatched cascade (graph.py:222-230)") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graftenrich")
    java.nio.file.Files.writeString(tmp.resolve("rating.csv"),
      "user_id::string,item_id::string,rating::number\n" +
        "u1,i1,5\nu1,i2,4\nu2,i2,3\nu2,i3,5\n") // i3: unmatched -> dropped
    java.nio.file.Files.writeString(tmp.resolve("item.csv"),
      "item_id::string,year::string\ni1,1995\ni2,1996\ni3,1997\n")
    // i3 has no URI row; i2's URI is null-equivalent (empty field)
    java.nio.file.Files.writeString(tmp.resolve("map.csv"),
      "item_id::string,URI::string\ni1,dbr:One\ni2,dbr:Two\n")
    java.nio.file.Files.writeString(tmp.resolve("enriched.csv"),
      "item_id::string,subject::string_list\ni1,S1::S2\ni3,S3\n")
    val cfg =
      s"""experiment:
         |  dataset:
         |    ratings: ${tmp.resolve("rating.csv")}
         |    item:
         |      path: ${tmp.resolve("item.csv")}
         |      extra_features: [year]
         |    enrich:
         |      map_path: ${tmp.resolve("map.csv")}
         |      enrich_path: ${tmp.resolve("enriched.csv")}
         |      remove_unmatched: True
         |      properties: [subject]
         |""".stripMargin
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](cfg)
      .get("experiment").asInstanceOf[java.util.Map[String, Object]]
    val ds = root.get("dataset").asInstanceOf[java.util.Map[String, Object]]
    val bundle = graft.cli.Experiment.loadDataset(spark, ds)
    // remove_unmatched: i3 is gone from the item set and its rating dropped
    assert(bundle.items.get.select("item_id").collect().map(_.getString(0)).sorted
      .sameElements(Array("i1", "i2")))
    assert(bundle.ratings.filter(col("item_id") === "i3").count() == 0
      && bundle.ratings.count() == 3)
    val edges = bundle.propertyEdges.get.collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    // map match columns become URI property edges for matched items only
    assert(edges.contains(("Item(i1)", "Property(dbr:One, URI)")))
    assert(edges.contains(("Item(i2)", "Property(dbr:Two, URI)")))
    // enriched string_list fans out; i3's enrich row is filtered with the item
    assert(edges.contains(("Item(i1)", "Property(S1, subject)")))
    assert(edges.contains(("Item(i1)", "Property(S2, subject)")))
    assert(!edges.exists(_._2 == "Property(S3, subject)"))
    // extra_features survive the filtered item set
    assert(edges.contains(("Item(i1)", "Property(1995, year)")))
    assert(!edges.exists(_._1 == "Item(i3)"))
  }

  test("remove_unmatched with a URI-less map file fails fast (graph.py:226-227 KeyError parity)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftnouri")
    java.nio.file.Files.writeString(tmp.resolve("rating.csv"),
      "user_id::string,item_id::string,rating::number\nu1,i1,5\n")
    java.nio.file.Files.writeString(tmp.resolve("item.csv"),
      "item_id::string\ni1\n")
    // the match column is misnamed: the reference KeyErrors on
    // df_item['URI'] here — we must not silently guess 'uri_link'
    java.nio.file.Files.writeString(tmp.resolve("map.csv"),
      "item_id::string,uri_link::string\ni1,dbr:One\n")
    def ds(removeUnmatched: Boolean) = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](
        s"""ratings: ${tmp.resolve("rating.csv")}
           |item: {path: ${tmp.resolve("item.csv")}}
           |enrich:
           |  map_path: ${tmp.resolve("map.csv")}
           |  remove_unmatched: $removeUnmatched
           |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.cli.Experiment.loadDataset(spark, ds(removeUnmatched = true))
    }
    assert(e.getMessage.contains("URI"))
    // without remove_unmatched the reference never touches URI — loading
    // proceeds and the map columns still become property edges
    val bundle = graft.cli.Experiment.loadDataset(spark, ds(removeUnmatched = false))
    assert(bundle.ratings.count() == 1)
    assert(bundle.propertyEdges.get.collect()
      .exists(_.getString(2) == "Property(dbr:One, uri_link)"))
  }

  test("report rows dedup last-wins on (model, fold) when names collide") {
    // 'deepwalk' (unbiased) and 'node2vec' produce the identical
    // "Node2Vec based model..." string at matching p/q/embedding_size;
    // the reference's dict-keyed rows never mix two models into one
    // mean — the later-listed configuration must win per fold
    val rows = Seq(
      ("Node2Vec based model;q=1.0;p=1.0", 1, Seq("MAP" -> 0.1), 1.0),
      ("Node2Vec based model;q=1.0;p=1.0", 2, Seq("MAP" -> 0.2), 1.0),
      ("popularity", 1, Seq("MAP" -> 0.5), 2.0),
      ("Node2Vec based model;q=1.0;p=1.0", 1, Seq("MAP" -> 0.3), 3.0), // collides with row 1
      ("Node2Vec based model;q=1.0;p=1.0", 2, Seq("MAP" -> 0.4), 3.0), // collides with row 2
      ("popularity", 2, Seq("MAP" -> 0.6), 2.0))
    val d = graft.cli.Experiment.dedupLastWins(rows)
    assert(d.size == 4)
    // last-wins: the second node2vec-named config's values survive
    val n2v = d.filter(_._1.startsWith("Node2Vec")).sortBy(_._2)
    assert(n2v.map(_._3.head._2) == Seq(0.3, 0.4))
    // non-colliding rows pass through in original order
    assert(d.map(_._1) == Seq("popularity", "Node2Vec based model;q=1.0;p=1.0",
      "Node2Vec based model;q=1.0;p=1.0", "popularity"))
  }

  test("Tables.events normalizes all three ts layouts to the same instants") {
    // The driver's testdata has shipped as TIMESTAMP(NANOS) (read as
    // Long under nanosAsLong) and later as TIMESTAMP(MICROS, ntz); the
    // loader must produce identical TimestampType instants from either,
    // and pass an already-adjusted TIMESTAMP through untouched.
    val millis = Seq(1700000000123L, 1700000060456L, 1700003600789L)
    def base = millis.zipWithIndex.map { case (ms, i) =>
      (i.toLong, ms, i.toLong % 2, "view", 1.0, """{"k":1}""") }
      .toDF("event_id", "ms", "user_id", "event_type", "value", "props")
    val root = java.nio.file.Files.createTempDirectory("graft_ts_layouts")
    def dir(name: String) = { val d = root.resolve(name); d.toFile.mkdirs(); d.toString }
    val (dLong, dNtz, dUtc) = (dir("long"), dir("ntz"), dir("utc"))
    // legacy layout analogue: ts as raw int64 nanos (a true TIMESTAMP(NANOS)
    // footer is unwritable from Spark; the Long branch is what the
    // nanosAsLong fallback decodes it to, so this exercises the same math)
    base.withColumn("ts", col("ms") * 1000000L).drop("ms")
      .coalesce(1).write.mode("overwrite").parquet(s"$dLong/events.parquet")
    // current layout: TIMESTAMP(MICROS, isAdjustedToUTC=false)
    base.withColumn("ts", timestamp_millis(col("ms")).cast("timestamp_ntz")).drop("ms")
      .coalesce(1).write.mode("overwrite").parquet(s"$dNtz/events.parquet")
    // adjusted-UTC layout: plain TimestampType pass-through
    base.withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      .coalesce(1).write.mode("overwrite").parquet(s"$dUtc/events.parquet")
    val out = Seq(dLong, dNtz, dUtc).map { d =>
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
      ev.orderBy("event_id").select(unix_millis(col("ts"))).as[Long].collect().toSeq
    }
    assert(out.forall(_ == millis), s"layouts disagree: $out vs $millis")
  }
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The seven dataset dialects of the reference's data-integration layer
  * (`data_integration/dataset2class.py`), each a raw-scan -> standardized
  * frame converter plus the dataset's SPARQL map/enrich query builders
  * (F6 template substitution — `string.Template.substitute`).
  *
  * Dialect quirks ride on Spark's native CSV options (multi-char `sep`,
  * `encoding`, `escape`), so every scan stays a distributed,
  * pushdown-capable FileScan — no driver-side parsing. Query building is
  * pure Column algebra (codegen'd), so a 10M-item map job builds its 10M
  * query strings executor-side.
  */
object Datasets {

  /** One reference dataset dialect. Standardized frames carry PLAIN
    * column names with Spark-native types; [[graft.schema.TypedCsv.write]]
    * derives the `name::type` headers the framework loads. Loaders are
    * None where the reference leaves the hook unimplemented (e.g. steam
    * items-only — steam.py has no rating loader). */
  trait DatasetDef {
    def name: String
    def items(spark: SparkSession, dir: String): Option[DataFrame] = None
    def users(spark: SparkSession, dir: String): Option[DataFrame] = None
    def ratings(spark: SparkSession, dir: String): Option[DataFrame] = None
    def social(spark: SparkSession, dir: String): Option[DataFrame] = None

    /** F6: per-item SPARQL map queries for entity linking —
      * (item_id, query, expected) where `expected` is the URI guess the
      * fuzzy disambiguation compares candidates against
      * (movielens.py:126-131). None = dataset has no linking step. */
    def mapQueries(items: DataFrame): Option[DataFrame] = None
    /** The SELECT variable carrying the URI in map results
      * (?film / ?book / ?game / ?artist). */
    def bindingVar: String = "uri"
    /** Enrich query for one mapped URI column; None = no enrich step. */
    def enrichQuery(uri: Column): Option[Column] = None
    /** Properties the enrich query emits, in order; head is the plain
      * `abstract` string, the rest are `::`-concatenated lists. */
    def enrichProperties: Seq[String] = Seq.empty
  }

  /** `$key` -> value template substitution over Columns (F6,
    * dataset.py:50-51 `Template(...)`): every occurrence is expanded,
    * executor-side. */
  def substitute(template: String, params: (String, Column)*): Column =
    params.foldLeft(lit(template): Column) { case (acc, (k, v)) =>
      call_function("replace", acc, lit("$" + k), v)
    }

  /** Python-side regex builder shared by the map queries: strip
    * punctuation, escape nothing else, spaces -> `.*`, anchor at start
    * (book-crossing.py:89-95 et al). */
  private def nameRegex(c: Column, anchorEnd: Boolean, asciiFold: Boolean = false,
                        stripPunct: Boolean = true): Column = {
    val folded = if (asciiFold) graft.text.TextOps.asciiFold(c) else c
    val cleaned = if (stripPunct) graft.text.TextOps.stripPunctuation(folded) else folded
    val anchored = concat(lit("^"), regexp_replace(cleaned, " ", ".*"))
    if (anchorEnd) concat(anchored, lit("$")) else anchored
  }

  private val sparqlPrefixes =
    """PREFIX dct:  <http://purl.org/dc/terms/>
      |PREFIX dbo:  <http://dbpedia.org/ontology/>
      |PREFIX dbr:  <http://dbpedia.org/resource/>
      |PREFIX rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
      |""".stripMargin

  /** Typed `rdf:type X` map template with label-regex + redirect UNION
    * (the shape every dataset's map query shares). */
  private def typedMapTemplate(varName: String, rdfTypes: Seq[String],
                               extraPattern: String = ""): String = {
    val branches = rdfTypes.flatMap { t =>
      Seq(
        s"""{
           |  ?$varName rdf:type $t .$extraPattern
           |  ?$varName rdfs:label ?label .
           |  FILTER regex(?label, "$$name_regex", "i")
           |}""".stripMargin,
        s"""{
           |  ?$varName rdf:type $t .$extraPattern
           |  ?tmp dbo:wikiPageRedirects ?$varName .
           |  ?tmp rdfs:label ?label .
           |  FILTER regex(?label, "$$name_regex", "i") .
           |}""".stripMargin)
    }
    sparqlPrefixes + s"SELECT DISTINCT ?$varName WHERE {\n" +
      branches.mkString("\nUNION\n") + "\n}"
  }

  private def enrichTemplate(props: Seq[(String, String)]): String = {
    // props: (varName, predicate); abstract is the lone non-concat var
    val selects = props.map {
      case ("abstract", _) => "?abstract"
      case (v, _) => s"""(GROUP_CONCAT(DISTINCT ?$v; SEPARATOR="::") AS ?$v)"""
    }
    val patterns = props.map { case (v, pred) => s"OPTIONAL { <$$URI> $pred ?$v } ." }
    sparqlPrefixes + "SELECT DISTINCT\n" + selects.mkString("\n") +
      "\nWHERE {\n" + patterns.mkString("\n") +
      "\nFILTER(LANG(?abstract) = 'en')\n}"
  }

  private def expectedUri(nameCol: Column): Column =
    concat(lit("http://dbpedia.org/resource/"), nameCol)

  // ---- ml-100k (movielens.py:187-283) ---------------------------------

  object MovieLens100k extends DatasetDef {
    val name = "ml-100k"
    private val itemCols = Seq("movie_id", "movie_title_raw", "release_date",
      "video_release_date", "imdb_url", "unknown") ++ (1 to 18).map(g => s"genre_$g")

    override def items(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      Converters.readDelimited(spark, s"$dir/u.item", "|", "ISO-8859-1", itemCols)
        .drop("video_release_date", "unknown", "imdb_url")
        .na.drop() // movielens.py:239 dropna() over the remaining fields
        .select(
          col("movie_id").as("item_id"),
          Converters.normalizeTitleExpr("movie_title_raw").as("movie_title"),
          Converters.extractYear(col("movie_title_raw")).cast("string").as("movie_year"))
    }

    override def users(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      Converters.readDelimited(spark, s"$dir/u.user", "|", "ISO-8859-1",
        Seq("user_id", "age", "gender", "occupation", "zip_code"))
        .select(col("user_id"), col("age").cast("string").as("age"),
          col("gender"), col("occupation"))
    }

    override def ratings(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      Converters.readDelimited(spark, s"$dir/u.data", "\t", "ISO-8859-1",
        Seq("user_id", "item_id", "rating", "timestamp"))
        .select(col("user_id"), col("item_id"),
          col("rating").cast("double").as("rating"),
          col("timestamp").cast("double").as("timestamp"))
    }

    override def bindingVar: String = "film"
    private val mapTpl = typedMapTemplate("film", Seq("dbo:Film"),
      extraPattern = "\n  ?film dct:subject $year_category .")

    /** movielens.py:140-151: regex keeps punctuation (the translate call
      * is commented out in the reference), no end anchor; plus the
      * `dbr:Category:{year}_films` subject constraint. */
    override def mapQueries(items: DataFrame): Option[DataFrame] = Some {
      items.select(
        col("item_id"),
        substitute(mapTpl,
          "name_regex" -> nameRegex(col("movie_title"), anchorEnd = false, stripPunct = false),
          "year_category" -> concat(lit("dbr:Category:"), col("movie_year"), lit("_films"))
        ).as("query"),
        expectedUri(col("movie_title")).as("expected"))
    }

    private val enrichProps = Seq(
      "abstract" -> "dbo:abstract", "producer" -> "dbo:producer",
      "distributor" -> "dbo:distributor", "writer" -> "dbo:writer",
      "cinematography" -> "dbo:cinematography", "subject" -> "dct:subject",
      "starring" -> "dbo:starring", "director" -> "dbo:director")
    private val enrichTpl = enrichTemplate(enrichProps)
    override def enrichQuery(uri: Column): Option[Column] =
      Some(substitute(enrichTpl, "URI" -> uri))
    override def enrichProperties: Seq[String] = enrichProps.map(_._1)
  }

  // ---- ml-1m (movielens.py:285-375): `::`-separated, headerless -------

  object MovieLens1M extends DatasetDef {
    val name = "ml-1m"

    override def items(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      Converters.readDelimited(spark, s"$dir/movies.dat", "::", "ISO-8859-1",
        Seq("movie_id", "title", "genres"))
        .select(
          col("movie_id").as("item_id"),
          Converters.normalizeTitleExpr("title").as("movie_title"),
          Converters.extractYear(col("title")).cast("string").as("movie_year"))
    }

    override def users(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      Converters.readDelimited(spark, s"$dir/users.dat", "::", "ISO-8859-1",
        Seq("user_id", "gender", "age", "occupation", "zip_code"))
        .select(col("user_id"), col("gender"),
          col("age").cast("string").as("age"), col("occupation"))
    }

    override def ratings(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      Converters.readDelimited(spark, s"$dir/ratings.dat", "::", "ISO-8859-1",
        Seq("user_id", "movie_id", "rating", "timestamp"))
        .select(col("user_id"), col("movie_id").as("item_id"),
          col("rating").cast("double").as("rating"),
          col("timestamp").cast("double").as("timestamp"))
    }

    override def bindingVar: String = MovieLens100k.bindingVar
    override def mapQueries(items: DataFrame): Option[DataFrame] =
      MovieLens100k.mapQueries(items)
    override def enrichQuery(uri: Column): Option[Column] = MovieLens100k.enrichQuery(uri)
    override def enrichProperties: Seq[String] = MovieLens100k.enrichProperties
  }

  // ---- book-crossing (book-crossing.py:48-95) -------------------------

  object BookCrossing extends DatasetDef {
    val name = "book-crossing"

    /** `;`-separated CP1252 with `\`-escapes and a header row; the three
      * trailing image-URL columns are dropped (book-crossing.py:49-55). */
    override def items(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      // windows-1252 is outside Spark 4's default charset allowlist
      spark.conf.set("spark.sql.legacy.javaCharsets", "true")
      val raw = spark.read
        .option("sep", ";").option("encoding", "windows-1252")
        .option("escape", "\\").option("header", "true")
        .csv(s"$dir/BX-Books.csv")
      val keep = raw.columns.dropRight(3)
      raw.select(keep.map(col).toIndexedSeq: _*)
        .toDF("item_id", "title", "author", "year", "publisher")
    }

    override def bindingVar: String = "book"
    private val mapTpl = typedMapTemplate("book", Seq("dbo:WrittenWork"))
    /** book-crossing.py:89-95: punctuation stripped, `^`-anchored, no
      * end anchor. */
    override def mapQueries(items: DataFrame): Option[DataFrame] = Some {
      items.select(
        col("item_id"),
        substitute(mapTpl,
          "name_regex" -> nameRegex(col("title"), anchorEnd = false)).as("query"),
        expectedUri(col("title")).as("expected"))
    }
  }

  // ---- steam (steam.py:47-100): items only ----------------------------

  object Steam extends DatasetDef {
    val name = "steam"

    override def items(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      spark.read.option("header", "true").csv(s"$dir/steam_games.csv")
        .select(col("app_id").as("item_id"), col("title"), col("date_release"))
    }

    override def bindingVar: String = "game"
    private val mapTpl = typedMapTemplate("game", Seq("dbo:VideoGame"))
    /** steam.py:91-99: ascii-fold first, punctuation stripped, both
      * anchors. */
    override def mapQueries(items: DataFrame): Option[DataFrame] = Some {
      items.select(
        col("item_id"),
        substitute(mapTpl,
          "name_regex" -> nameRegex(col("title"), anchorEnd = true, asciiFold = true)).as("query"),
        expectedUri(col("title")).as("expected"))
    }
  }

  // ---- douban-movie (douban-movie.py:6-76) ----------------------------

  /** Single raw DMSC.csv; item and user dims get surrogate keys, ratings
    * join them back (J3). DEVIATION: the reference numbers dims by
    * first-occurrence row order (pandas reset_index), we number by the
    * natural-key sort — deterministic under any partitioning, bijective
    * either way (DEVIATIONS.md). */
  object DoubanMovie extends DatasetDef {
    val name = "douban-movie"

    private def raw(spark: SparkSession, dir: String): DataFrame =
      spark.read.option("header", "true").option("escape", "\"").csv(s"$dir/DMSC.csv")

    override def items(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      val (_, joined) = Converters.surrogateKeyJoin(
        raw(spark, dir).select("Movie_Name_EN", "Movie_Name_CN").distinct(), "Movie_Name_EN", "movie_id")
      joined.select(col("movie_id").cast("string").as("item_id"),
        col("Movie_Name_EN").as("name_EN"), col("Movie_Name_CN").as("name_CN"))
    }

    override def users(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      val (dim, _) = Converters.surrogateKeyJoin(
        raw(spark, dir).select("Username").distinct(), "Username", "user_id")
      dim.select(col("user_id").cast("string").as("user_id"), col("Username").as("name"))
    }

    override def ratings(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      val r = raw(spark, dir)
      val (items, _) = Converters.surrogateKeyJoin(
        r.select("Movie_Name_EN", "Movie_Name_CN").distinct(), "Movie_Name_EN", "movie_id")
      val (users, _) = Converters.surrogateKeyJoin(
        r.select("Username").distinct(), "Username", "user_id")
      r.select("ID", "Date", "Star", "Comment", "Like", "Movie_Name_EN", "Username")
        .distinct() // douban-movie.py:66 drop_duplicates on the extract
        .join(items.select("Movie_Name_EN", "movie_id"), Seq("Movie_Name_EN"))
        .join(users, Seq("Username"))
        .select(col("user_id").cast("string").as("user_id"),
          col("movie_id").cast("string").as("item_id"),
          col("Star").cast("double").as("rating"),
          col("Date").as("date"), col("Comment").as("comment"),
          col("Like").cast("double").as("like_count"))
    }
  }

  // ---- lastfm (lastfm.py:17-215) --------------------------------------

  object LastFM extends DatasetDef {
    val name = "lastfm"

    private def tsv(spark: SparkSession, dir: String, f: String): DataFrame =
      spark.read.option("sep", "\t").option("header", "true").csv(s"$dir/$f")

    override def items(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      tsv(spark, dir, "artists.dat").select(col("id").as("item_id"), col("name"))
    }

    /** lastfm.py:207-215: no user file — distinct users of the rating
      * scan. */
    override def users(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      tsv(spark, dir, "user_artists.dat").select(col("userID").as("user_id")).distinct()
    }

    override def ratings(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      tsv(spark, dir, "user_artists.dat").select(
        col("userID").as("user_id"), col("artistID").as("item_id"),
        col("weight").cast("double").as("rating"))
    }

    override def social(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      tsv(spark, dir, "user_friends.dat").select(
        col("userID").as("user1"), col("friendID").as("user2"))
    }

    override def bindingVar: String = "artist"
    private val mapTpl = typedMapTemplate("artist", Seq("dbo:MusicalArtist", "dbo:Band"))
    /** lastfm.py:146-154: punctuation stripped, both anchors. */
    override def mapQueries(items: DataFrame): Option[DataFrame] = Some {
      items.select(
        col("item_id"),
        substitute(mapTpl,
          "name_regex" -> nameRegex(col("name"), anchorEnd = true)).as("query"),
        expectedUri(col("name")).as("expected"))
    }

    private val enrichProps = Seq(
      "abstract" -> "dbo:abstract", "bandMember" -> "dbo:bandMember",
      "genre" -> "dbo:genre", "associatedMusicalArtist" -> "dbo:associatedMusicalArtist",
      "awards" -> "dbp:awards", "recordLabel" -> "dbo:recordLabel",
      "associatedBand" -> "dbo:associatedBand", "origin" -> "dbp:origin")
    private val enrichTpl = enrichTemplate(enrichProps)
    override def enrichQuery(uri: Column): Option[Column] =
      Some(substitute(enrichTpl, "URI" -> uri))
    override def enrichProperties: Seq[String] = enrichProps.map(_._1)
  }

  // ---- yelp (yelp.py:8-143): JSONL scans ------------------------------

  object Yelp extends DatasetDef {
    val name = "yelp"

    override def items(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      val b = spark.read.json(s"$dir/yelp_academic_dataset_business.json")
      b.select(
        col("business_id").as("item_id"), col("name"), col("address"),
        col("city"), col("state"), col("postal_code"),
        col("latitude").cast("double").as("latitute"), // sic — yelp.py:26 typo kept
        col("longitude").cast("double").as("longitude"),
        col("stars").cast("double").as("stars"),
        col("review_count").cast("double").as("review_count"),
        col("is_open").cast("double").as("is_open"),
        // JSONL infers `attributes` as a struct; bridge to map through
        // JSON so the keep-True filter works on any attribute set
        expr("map_keys(map_filter(from_json(to_json(attributes), 'map<string,string>'), (k, v) -> v = 'True'))")
          .as("attributes"), // P9 keep-True (yelp.py:84-88)
        split(col("categories"), ", ").as("categories"))
    }

    override def users(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      spark.read.json(s"$dir/yelp_academic_dataset_user.json").select(
        col("user_id"), col("name"),
        col("review_count").cast("double").as("review_count"),
        col("yelping_since"),
        col("useful").cast("double").as("useful_count"),
        col("funny").cast("double").as("funny_count"),
        col("cool").cast("double").as("cool_count"),
        split(col("elite").cast("string"), ",").as("elite_years"),
        col("fans").cast("double").as("fans_count"),
        col("average_stars").cast("double").as("average_stars"))
    }

    override def ratings(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      spark.read.json(s"$dir/yelp_academic_dataset_review.json").select(
        col("user_id"), col("business_id").as("item_id"),
        col("stars").cast("double").as("rating"),
        col("useful").cast("double").as("useful_count"),
        col("funny").cast("double").as("funny_count"),
        col("cool").cast("double").as("cool_count"),
        col("text"), col("date"))
    }

    /** yelp social: explode each user's `friends` CSV-in-string list
      * (yelp.py:133-143). */
    override def social(spark: SparkSession, dir: String): Option[DataFrame] = Some {
      spark.read.json(s"$dir/yelp_academic_dataset_user.json")
        .select(col("user_id").as("user1"),
          explode(split(col("friends").cast("string"), ", ")).as("user2"))
        .filter(col("user2").isNotNull && col("user2") =!= "" && col("user2") =!= "None")
    }
  }

  /** name -> dialect, mirroring dataset2class.py. */
  val registry: Map[String, DatasetDef] = Seq(
    MovieLens100k, MovieLens1M, BookCrossing, Steam, DoubanMovie, LastFM, Yelp
  ).map(d => d.name -> d).toMap
}

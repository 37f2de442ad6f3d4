package graft

import graft.etl.{FixtureSparql, SparqlSource}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q50's fixture transports must be exact inverses of the query
  * builders they replay — a drift here silently turns the integration
  * oracle into a tautology. */
class FixtureSparqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("map-query title recovery inverts nameRegex (stripPunct=false)") {
    val items = Seq(("1", "small ring", "1994")).toDF("item_id", "movie_title", "movie_year")
    val q = graft.etl.Datasets.MovieLens100k.mapQueries(items).get
      .select("query").as[String].first()
    assert(FixtureSparql.titleFromMapQuery(q) == "small ring")
  }

  test("enrich-query URI recovery skips the PREFIX block") {
    val q = graft.etl.Datasets.MovieLens100k
      .enrichQuery(lit("http://dbpedia.org/resource/small ring")).get
    val rendered = Seq(1).toDF("x").select(q.as("q")).as[String].first()
    assert(FixtureSparql.uriFromEnrichQuery(rendered) == "http://dbpedia.org/resource/small ring")
  }

  test("map fixture: exact candidate outranks the decoy through disambiguate") {
    val body = FixtureSparql.jsonTransport("e", fakeMapQuery("blue bolt"), 0)
    assert(body.contains("http://dbpedia.org/resource/blue bolt"))
    assert(body.contains("http://dbpedia.org/resource/Category:blue"))
    val cands = Seq(
      ("1", "http://dbpedia.org/resource/blue bolt", "http://dbpedia.org/resource/blue bolt"),
      ("1", "http://dbpedia.org/resource/blue bolt", "http://dbpedia.org/resource/Category:blue"))
      .toDF("item_id", "expected", "uri")
      .withColumn("candidate_label", col("uri"))
    val best = SparqlSource.disambiguate(cands).collect()
    assert(best.length == 1)
    assert(best.head.getString(1) == "http://dbpedia.org/resource/blue bolt")
    assert(best.head.getInt(2) == 100)
  }

  test("enrich fixture row is a pure function of the URI's title") {
    val q = "OPTIONAL { <http://dbpedia.org/resource/hot gear> dbo:abstract ?abstract } ."
    val body = FixtureSparql.csvTransport("e", q, 0)
    val row = SparqlSource.firstCsvRow(body).get
    assert(row("abstract") == "All about hot gear")
    assert(row("producer") == "hot::gear")
    assert(row("director") == "gear")
    assert(row("subject") == "Category:hot")
  }

  private def fakeMapQuery(title: String): String =
    s"""FILTER regex(?label, "^${title.replace(" ", ".*")}", "i")"""
}

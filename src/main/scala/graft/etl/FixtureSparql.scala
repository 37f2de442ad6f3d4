package graft.etl

/** Deterministic SPARQL fixture transports (S4/S5 oracle exposure):
  * replay the full data-integration path — map_URIs' JSON candidate
  * fan-out and enrich_data's CSV first-row parse
  * (`data_integration/dataset.py:225-262`) — with responses that are a
  * pure function of the query text, so the whole pipeline is
  * reproducible by a SQL oracle over the same source table with zero
  * network (SURVEY §5.5 no-network rule).
  *
  * The map response carries TWO candidates per item: the exact expected
  * URI (WRatio 100 by construction) and a lower-scoring decoy — so the
  * fuzzy top-1 disambiguation (J7) genuinely selects, while the winner
  * stays SQL-predictable.
  */
object FixtureSparql {

  val ResourcePrefix = "http://dbpedia.org/resource/"

  /** Invert Datasets.nameRegex (stripPunct=false): the map query embeds
    * `FILTER regex(?label, "^small.*ring", "i")`; titles in the fixture
    * catalog are lowercase words, so `^`-strip + `.*`->space recovers
    * the title exactly. */
  private[graft] def titleFromMapQuery(q: String): String = {
    val m = """FILTER regex\(\?label, "([^"]+)", "i"\)""".r.findFirstMatchIn(q)
      .getOrElse(sys.error("fixture transport: map query carries no label regex"))
    m.group(1).stripPrefix("^").stripSuffix("$").replace(".*", " ")
  }

  /** The enrich query's first OPTIONAL pattern carries the mapped URI:
    * `OPTIONAL { <http://dbpedia.org/resource/small ring> dbo:... }`. */
  private[graft] def uriFromEnrichQuery(q: String): String =
    """OPTIONAL \{ <([^>]+)>""".r.findFirstMatchIn(q)
      .getOrElse(sys.error("fixture transport: enrich query carries no URI pattern"))
      .group(1)

  /** Map-step transport: SPARQL JSON with a perfect candidate and a
    * decoy (`?film` binding, ml-100k's bindingVar). */
  val jsonTransport: SparqlSource.Transport = (_, q, _) => {
    val t = titleFromMapQuery(q)
    val good = ResourcePrefix + t
    val decoy = ResourcePrefix + "Category:" + t.split(' ').head
    s"""{"results":{"bindings":[{"film":{"value":"$good"}},{"film":{"value":"$decoy"}}]}}"""
  }

  /** Enrich-step transport: CSV header + ONE data row (movielens.py
    * takes `.iloc[0]`), every property a deterministic pure function of
    * the title so DuckDB can reconstruct it from the source table.
    * List-valued properties arrive "::"-concatenated, as DBpedia's
    * GROUP_CONCAT does. */
  val csvTransport: SparqlSource.Transport = (_, q, _) => {
    val t = uriFromEnrichQuery(q).stripPrefix(ResourcePrefix)
    val words = t.split(' ')
    val row = Seq(
      "All about " + t,       // abstract (plain string)
      t.replace(" ", "::"),   // producer: one entry per title word
      "D1::D2",               // distributor: fixed 2-list
      "W_" + t,               // writer: single entry
      "C",                    // cinematography: single entry
      "Category:" + words.head, // subject
      "S1::" + t,             // starring: fixed head + title
      words.last)             // director: last title word
    "abstract,producer,distributor,writer,cinematography,subject,starring,director\n" +
      row.mkString(",")
  }
}

package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The heterogeneous user-item-property graph as two immutable
  * DataFrames, replacing the reference's mutable `Graph(nx.Graph)`
  * (`framework/dataloader/graph/graph.py:18-26`).
  *
  * Node identity is the canonical string label produced by the
  * reference's node classes — `Item(id)`, `User(id)`,
  * `Property(value, type)` (`framework/dataloader/graph/node.py:22-23,
  * 43-44, 65-66`). Property equality is scoped by type (node.py:75-77):
  * two equal values under different property types are DIFFERENT nodes,
  * which the label encodes naturally.
  */
object KGraph {

  /** `User({id})` — node.py:43-44. */
  def userLabel(id: Column): Column = format_string("User(%s)", id)

  /** `Item({id})` — node.py:22-23. */
  def itemLabel(id: Column): Column = format_string("Item(%s)", id)

  /** `Property({value}, {type})` — node.py:65-66. */
  def propertyLabel(value: Column, propertyType: String): Column =
    format_string(s"Property(%s, $propertyType)", value)

  /** Relation label `rating{r}` where {r} is Python `str()` of the
    * rating (graph.py:90,122): integral doubles print with a trailing
    * `.0` (str(4.0) == "4.0"), non-integral print plainly. */
  def ratingRelation(rating: Column): Column =
    concat(lit("rating"),
      when(rating === rating.cast("long").cast("double"),
        concat(rating.cast("long").cast("string"), lit(".0")))
        .otherwise(rating.cast("string")))

  /** Rating triples (User, rating{r}, Item) — graph.py:111-125. */
  def ratingTriples(ratings: DataFrame): DataFrame =
    ratings.select(
      userLabel(col("user_id")).as("head"),
      ratingRelation(col("rating")).as("relation"),
      itemLabel(col("item_id")).as("tail"))

  /** Property triples: (Item, has, Property) or (User, is, Property) —
    * graph.py:89-107. `values` may be a string_list column (exploded). */
  def propertyTriples(entities: DataFrame, idCol: String, isUser: Boolean,
                      valueCol: String, propertyType: String): DataFrame = {
    val head = if (isUser) userLabel(col(idCol)) else itemLabel(col(idCol))
    val rel = if (isUser) "is" else "has"
    entities
      .filter(col(valueCol).isNotNull)
      .select(head.as("head"), lit(rel).as("relation"),
        propertyLabel(col(valueCol), propertyType).as("tail"))
  }

  /** All triples = ratings ∪ user-props ∪ item-props (graph.py:79-109). */
  def allTriples(ratings: DataFrame, props: Seq[DataFrame]): DataFrame =
    props.foldLeft(ratingTriples(ratings))(_ unionByName _)

  /** Entity-column → Property-edge explosion (`_add_node_property`,
    * graph.py:246-257): each feature column value becomes a
    * Property(value, column) node; string_list columns fan out; null
    * and empty values are skipped. The construction the Experiment
    * CLI's enrich/extra_features channels feed into KGE `triples: all`
    * training — q174 puts it under the oracle gate.
    *
    * @return None when none of `cols` exist on `df` */
  def propertyEdges(df: DataFrame, idCol: String, isUser: Boolean,
                    cols: Seq[String]): Option[DataFrame] =
    cols.filter(df.columns.contains).map { f =>
      val vals = df.schema(f).dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          df.select(col(idCol), explode(col(f)).as("v"))
        case _ => df.select(col(idCol), col(f).cast("string").as("v"))
      }
      vals.filter(col("v").isNotNull && col("v") =!= "")
        .select(
          (if (isUser) userLabel(col(idCol)) else itemLabel(col(idCol))).as("src_label"),
          lit(if (isUser) "is" else "has").as("relation"),
          propertyLabel(col("v"), f).as("dst_label"))
    }.reduceOption(_ unionByName _)

  /** Bijective node-label -> dense-int relabeling, the Spark analogue of
    * `convert_node_labels_to_integer` (graph.py:168-191). Deterministic:
    * ids are the 0-based rank in the canonical label ordering, NOT
    * monotonically_increasing_id (SURVEY §1.3).
    *
    * Physical strategy: global sort (range-partitioned, parallel) + RDD
    * zipWithIndex, whose per-partition offsets come from one extra count
    * job — no single-partition stage at ANY cardinality. (An earlier
    * variant used a row_number window below a cardinality threshold;
    * that funnels the whole dimension through one task and spams
    * WindowExec warnings for zero benefit — at small cardinality both
    * formulations are sub-second, at large only this one survives.)
    * The RESULT comes back persisted and materialized (every caller
    * immediately joins it back from at least two sides); the
    * intermediate distinct set is released before returning, so one
    * relabel call pins exactly one node-dimension cache. Callers that
    * own the mapping's lifecycle should unpersist it when done (the
    * recommenders do, via fit-time unpersist or `release()`).
    */
  def relabel(labels: DataFrame): DataFrame = {
    val d = labels.distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = d.orderBy("label")
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("node_id", org.apache.spark.sql.types.LongType, nullable = false))
    val out = sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    d.unpersist(blocking = false)
    out
  }

  /** Edge-endpoint validation (J4, graph.py:293-302,309-314): keep only
    * edges whose endpoints exist in the node tables — two left-semi
    * joins, broadcast when dims are small. */
  def validateEdges(edges: DataFrame, users: DataFrame, items: DataFrame): DataFrame =
    edges
      .join(users.select("user_id"), Seq("user_id"), "left_semi")
      .join(items.select("item_id"), Seq("item_id"), "left_semi")

  /** Graph cardinality report (graph.py:37-44). */
  def info(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val n = nodes.agg(
      count(lit(1)).as("n_nodes"),
      count(when(col("label").startsWith("User("), 1)).as("n_users"),
      count(when(col("label").startsWith("Item("), 1)).as("n_items"),
      count(when(col("label").startsWith("Property("), 1)).as("n_properties"))
    n.crossJoin(edges.agg(count(lit(1)).as("n_edges")))
  }
}

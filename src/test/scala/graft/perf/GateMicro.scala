package graft.perf
import org.apache.spark.sql.functions._
import graft.text.TextOps
object GateMicro {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vocab = (0 until 64).map(i => s"w$i").mkString(" ")
    val docs = spark.range(1000000L).select(col("id").as("doc_id"), lit("en").as("lang"),
      array_join(expr(s"transform(sequence(0, 39), i -> element_at(split('$vocab', ' '), cast(pmod(xxhash64(id, i), 64) as int) + 1))"), " ").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def t(name: String)(c: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime(); val n = c.count()
      println(f"$name%-14s ${(System.nanoTime()-t0)/1e9}%.2fs (n=$n)")
    }
    val stage1 = docs.select(col("doc_id"), col("lang"), split(lower(col("text")), " ").as("w"))
    t("stage1")(stage1.filter(size(col("w")) > 100))
    val stage2 = stage1.select(col("doc_id"), col("lang"), col("w"), size(col("w")).as("n"),
      size(filter(col("w"), x => x.isin(TextOps.EnStop.map(lit(_)): _*))).as("en_n"),
      size(filter(col("w"), x => x.isin(TextOps.DeStop.map(lit(_)): _*))).as("de_n"),
      size(filter(col("w"), x => x.isin(TextOps.FrStop.map(lit(_)): _*))).as("fr_n"),
      size(filter(col("w"), x => x.isin(TextOps.EsStop.map(lit(_)): _*))).as("es_n"),
      expr("aggregate(w, 0L, (acc, x) -> acc + length(x))").as("sumlen"),
      expr("if(size(w) >= 3, transform(sequence(1, size(w) - 2), i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))), cast(array() as array<string>))").as("g3"))
    t("stage2")(stage2.filter(col("en_n") > 100))
    t("full_gate")(TextOps.curationGate(docs).filter(col("keep")))
    val t0 = System.nanoTime()
    val kept = TextOps.curationGate(docs)
      .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()(0).getLong(0)
    println(f"gate_agg        ${(System.nanoTime()-t0)/1e9}%.2fs (kept=$kept)")
    // struct-3gram variant: no string building
    val g3s = stage1.select(col("doc_id"),
      expr("if(size(w) >= 3, transform(sequence(1, size(w) - 2), i -> struct(element_at(w, i) as a, element_at(w, i + 1) as b, element_at(w, i + 2) as c)), array())").as("g3"))
    t("g3_struct")(g3s.filter(size(array_distinct(col("g3"))) > 100))
    spark.stop()
  }
}

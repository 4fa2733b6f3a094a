package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ConvertNameExpr, Text}

/** The classification stage of the reference pipeline re-expressed as
  * set-oriented Spark plans (json_classification.py, SURVEY O13-O22).
  *
  * Design for scale (SURVEY §4.1): classification is applied to the
  * DISTINCT normalized term set, never per occurrence — the
  * distinct-before-expensive-enrichment rewrite is planned in, and the
  * known-entities map prunes the classifier's input via a broadcast
  * anti join before any (potentially external) classify call.
  */
object Classify {

  /** Pluggable classifier over the distinct unknown-term set:
    * input one column `norm`, output (`norm`, `type`).
    * Mirrors O17's service boundary — the LLM batch call in the
    * reference (json_classification.py:160-192) — as a trait so tests
    * replay fixtures (MockClassifier ≙ test_mode) and offline runs use
    * the deterministic rule classifier.
    */
  trait Classifier {
    def classify(norms: DataFrame): DataFrame
  }

  /** Deterministic, engine-portable rule classifier: labels by an
    * md5-derived hash of the normalized term, so the DuckDB oracle can
    * reproduce it exactly. Pure column expressions — stays inside
    * whole-stage codegen; no driver round-trip, no UDF.
    */
  object RuleClassifier extends Classifier {
    def labelExpr(norm: Column): Column =
      element_at(
        array(lit("person"), lit("place"), lit("organization"), lit("term")),
        (pmod(Text.md5Hash32(norm), lit(4L)) + 1).cast("int"))

    /** DuckDB spelling of [[labelExpr]] applied to a column named `norm`. */
    val labelSql: String =
      "['person','place','organization','term']" +
        "[(CAST(('0x' || substr(md5(norm), 1, 8)) AS BIGINT) % 4) + 1]"

    override def classify(norms: DataFrame): DataFrame =
      norms.select(col("norm"), labelExpr(col("norm")).as("type"))
  }

  /** test_mode replay (json_classification.py:11-37,104-110): a recorded
    * norm->type map joined as a broadcast lookup; unknown terms fall out
    * and downstream precedence defaults them to 'term'.
    */
  final class MockClassifier(fixture: Map[String, String]) extends Classifier {
    override def classify(norms: DataFrame): DataFrame = {
      val s = norms.sparkSession
      import scala.jdk.CollectionConverters._
      val fixtureDf = s.createDataFrame(
        fixture.toSeq.map { case (n, t) => org.apache.spark.sql.Row(n, t) }.asJava,
        org.apache.spark.sql.types.StructType.fromDDL("norm STRING, type STRING"))
      norms.join(broadcast(fixtureDf), Seq("norm"), "inner")
    }
  }

  /** Known-entity harvest (O13, json_classification.py:313-320):
    * authors/recipients -> 'person', location -> 'place', keyed by the
    * normalized name. The reference builds a dict in author, recipient,
    * location write order, so 'place' overwrites 'person' on a
    * collision — max(type) reproduces that ('place' > 'person').
    */
  def knownEntities(flatDocs: DataFrame): DataFrame =
    // Single-pass multi-emit: three union arms would re-execute the
    // flatDocs join chain once per arm (no common-subtree sharing
    // across unions).
    flatDocs.select(explode(array(
        struct(Text.normTerm(col("author")).as("norm"), lit("person").as("type")),
        struct(Text.normTerm(col("recipient")).as("norm"), lit("person").as("type")),
        struct(Text.normTerm(col("loc")).as("norm"), lit("place").as("type"))))
        .as("x"))
      .select(col("x.norm").as("norm"), col("x.type").as("type"))
      .groupBy("norm")
      .agg(max(col("type")).as("type"))

  /** DuckDB CTE equivalent of [[knownEntities]] (expects `docs`). */
  val knownEntitiesSql: String =
    """known AS (
      SELECT norm, max(type) AS type FROM (
        SELECT lower(trim(regexp_replace(author, '\s+', ' ', 'g'))) AS norm, 'person' AS type FROM docs
        UNION ALL SELECT lower(trim(regexp_replace(recipient, '\s+', ' ', 'g'))), 'person' FROM docs
        UNION ALL SELECT lower(trim(regexp_replace(loc, '\s+', ' ', 'g'))), 'place' FROM docs)
      GROUP BY 1)"""

  /** O14: the distinct raw term-string set across main/midsub/sub —
    * a 3-way unpivot (`stack`) then distinct.
    */
  def allTerms(triples: DataFrame): DataFrame =
    triples.selectExpr("stack(3, main, midsub, sub) AS term")
      .filter(col("term").isNotNull)
      .distinct()

  val allTermsSql: String =
    """terms AS (
      SELECT DISTINCT term FROM (
        SELECT main AS term FROM triples
        UNION ALL SELECT midsub FROM triples
        UNION ALL SELECT sub FROM triples)
      WHERE term IS NOT NULL)"""

  /** O15 + O17 + O19: normalize the distinct terms, prune the known set
    * with an anti join, classify the rest, key the result map by the
    * normalized term. The known set carries NO broadcast hint: it is
    * entity-vocabulary-sized (grows with the corpus), so per repo
    * policy AQE broadcasts it while it fits and shuffles on the norm
    * key at scale — where the reference's in-memory dict would OOM,
    * this plan degrades to the right strategy instead.
    */
  def apiMap(terms: DataFrame, known: DataFrame, classifier: Classifier): DataFrame = {
    val unknown = terms
      .select(Text.normTerm(col("term")).as("norm"))
      .distinct()
      .join(known.select("norm"), Seq("norm"), "left_anti")
    classifier.classify(unknown)
  }

  /** DuckDB CTE equivalent of [[apiMap]] with the rule classifier
    * (expects `known` + `terms`).
    */
  val apiMapSql: String =
    s"""api AS (
      SELECT norm, ${RuleClassifier.labelSql} AS type FROM (
        SELECT DISTINCT lower(trim(regexp_replace(term, '\\s+', ' ', 'g'))) AS norm
        FROM terms t
        WHERE NOT EXISTS (
          SELECT 1 FROM known
          WHERE known.norm = lower(trim(regexp_replace(t.term, '\\s+', ' ', 'g'))))))"""

  /** O20-O21 label precedence (json_classification.py:258-264) applied
    * to the per-document triples:
    *   - main: known-entities first, else the API map, else 'term';
    *   - midsub/sub: API map only (never known), 'term' when empty —
    *     so a midsub that IS a known entity still labels 'term',
    *     because known terms were pruned from the API input (§2.3-4);
    *   - person-labeled terms get convert_name applied (O21).
    * Both maps are bounded by the distinct-term count — a VOCABULARY
    * bound that grows with the corpus, so neither carries a broadcast
    * hint (repo policy: AQE broadcasts them while they fit and
    * shuffles the joins on the norm key at scale; the reference's
    * equivalent in-memory dicts are the thing that would not survive
    * 100 TB). The fact table streams through codegen'd joins either
    * way.
    */
  def labelTriples(triples: DataFrame, known: DataFrame, api: DataFrame): DataFrame = {
    val k = known.withColumnRenamed("type", "k_type")
    val a = api.withColumnRenamed("type", "a_type")
    def normed(c: String) = Text.normTerm(col(c))
    def convertIfPerson(term: Column, label: Column): Column =
      when(label === "person", ConvertNameExpr.convertNameNative(term)).otherwise(term)

    val mainLab = coalesce(col("k_type"), col("a_type"), lit("term"))
    val withMain = triples
      .join(k, normed("main") === k("norm"), "left_outer").drop("norm")
      .join(a, normed("main") === a("norm"), "left_outer").drop("norm")
      .withColumn("main_type", lower(mainLab))
      .drop("k_type", "a_type")

    def subLabel(field: String)(df: DataFrame): DataFrame = {
      val a2 = api.withColumnRenamed("type", "s_type")
      df.join(a2, normed(field) === a2("norm"), "left_outer").drop("norm")
        .withColumn(s"${field}_type",
          when(col(field).isNull || col(field) === "", lit("term"))
            .otherwise(lower(coalesce(col("s_type"), lit("term")))))
        .drop("s_type")
    }

    val labeled = subLabel("sub")(subLabel("midsub")(withMain))
    // Pass every non-triple input column through (e.g. the position key
    // the nested re-nest path needs for document-order fidelity).
    val passthrough = triples.columns
      .filterNot(Set("main", "midsub", "sub")).toSeq.map(col)
    labeled.select(passthrough ++ Seq(
      convertIfPerson(col("main"), col("main_type")).as("main"),
      col("main_type"),
      convertIfPerson(col("midsub"), col("midsub_type")).as("midsub"),
      col("midsub_type"),
      convertIfPerson(col("sub"), col("sub_type")).as("sub"),
      col("sub_type")): _*)
  }

  /** DuckDB CTE equivalent of [[labelTriples]] on the synthetic corpus
    * (where convert_name is the identity — no names contain ", ").
    * Expects `triples`, `known`, `api`.
    */
  val labelTriplesSql: String =
    """labeled AS (
      SELECT t.documentID,
             t.main,
             lower(coalesce(k.type, am.type, 'term')) AS main_type,
             t.midsub,
             CASE WHEN t.midsub IS NULL OR t.midsub = '' THEN 'term'
                  ELSE lower(coalesce(amid.type, 'term')) END AS midsub_type,
             t.sub,
             CASE WHEN t.sub IS NULL OR t.sub = '' THEN 'term'
                  ELSE lower(coalesce(asub.type, 'term')) END AS sub_type
      FROM triples t
      LEFT JOIN known k ON lower(trim(regexp_replace(t.main, '\s+', ' ', 'g'))) = k.norm
      LEFT JOIN api am ON lower(trim(regexp_replace(t.main, '\s+', ' ', 'g'))) = am.norm
      LEFT JOIN api amid ON lower(trim(regexp_replace(t.midsub, '\s+', ' ', 'g'))) = amid.norm
      LEFT JOIN api asub ON lower(trim(regexp_replace(t.sub, '\s+', ' ', 'g'))) = asub.norm)"""
}

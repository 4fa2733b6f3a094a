package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic document corpus in the reference's document-model shape
  * (SURVEY.md §1.1), derived deterministically from the TPC-H-ish
  * testdata tables so every pipeline stage is DuckDB-oracle-checkable
  * at any scale factor:
  *
  *   - one document per order; author = the ordering customer,
  *     recipient = a derived name, location = the customer's nation
  *     (the known-entity sources, json_classification.py:313-320);
  *   - indexing triples (main, midsub, sub) = (p_name, p_brand, p_type)
  *     of the order's lineitems, deduplicated per document
  *     (xml_to_json.py:38-42 — the per-document triple set).
  *
  * The reference's first-wins document-order dedup is order-faithful on
  * the single-file XML path (see XmlDocs + specs); here the triple set
  * is canonicalized by DISTINCT, which at cluster scale is the only
  * deterministic choice (SURVEY §2.3-3).
  */
object Corpus {
  import graft.queries.QDef.t

  /** Flat per-document view: scalar fields of the §1.1 record. */
  def flatDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(
        concat(lit("doc-"), col("o_orderkey")).as("documentID"),
        concat(lit("Order "), col("o_orderkey")).as("documentTitle"),
        lit("Rotunda Archive").as("publicationName"),
        col("o_orderpriority").as("seriesName"),
        col("o_orderstatus").as("volumeInfo"),
        lit("UVA Press").as("publisher"),
        col("c_name").as("author"),
        concat(lit("Recipient "), col("o_orderkey") % 100).as("recipient"),
        col("n_name").as("loc"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_from"),
        date_format(date_add(to_date(col("o_orderdate")), 2), "yyyy-MM-dd").as("date_to"))

  /** DuckDB CTE equivalent of [[flatDocs]], shared by pipeline oracles. */
  val flatDocsSql: String =
    """docs AS (
      SELECT 'doc-' || o_orderkey AS documentID,
             'Order ' || o_orderkey AS documentTitle,
             'Rotunda Archive' AS publicationName,
             o_orderpriority AS seriesName,
             o_orderstatus AS volumeInfo,
             'UVA Press' AS publisher,
             c_name AS author,
             'Recipient ' || (o_orderkey % 100) AS recipient,
             n_name AS loc,
             strftime(o_orderdate, '%Y-%m-%d') AS date_from,
             strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 DAY, '%Y-%m-%d') AS date_to
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey)"""

  /** Per-document deduplicated (main, midsub, sub) index triples. */
  def indexTriples(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(
        concat(lit("doc-"), col("l_orderkey")).as("documentID"),
        col("p_name").as("main"),
        col("p_brand").as("midsub"),
        col("p_type").as("sub"))
      .distinct()

  /** The §1.1 nested document model (schema B1) over the synthetic
    * corpus: arrays/structs assembled in flight, indexing canonicalized
    * by sort (the per-document array is the deterministic unit).
    */
  def nestedDocs(s: SparkSession, dir: String): DataFrame =
    nestedDocsFrom(flatDocs(s, dir), indexTriples(s, dir))

  /** [[nestedDocs]] over already-staged flat/triple inputs (so cached
    * stage outputs are reused instead of re-deriving the corpus joins).
    */
  def nestedDocsFrom(flat: DataFrame, triples: DataFrame): DataFrame = {
    val trip = triples
      .groupBy("documentID")
      .agg(sort_array(collect_list(
        struct(col("main"), col("midsub"), col("sub")))).as("indexing"))
    flat.join(trip, Seq("documentID"), "left_outer")
      .select(
        col("documentID"),
        col("documentTitle"),
        struct(col("publicationName"), col("seriesName"), col("volumeInfo"),
          col("publisher"),
          array(lit("print"), lit("digital")).as("formats")).as("projectInfo"),
        array(struct(col("author").as("name"))).as("authors"),
        array(struct(col("recipient").as("name"))).as("recipients"),
        struct(col("date_from").as("date-from"),
          col("date_to").as("date-to")).as("dates"),
        struct(col("loc").as("name")).as("location"),
        array(lit("Library")).as("repositories"),
        coalesce(col("indexing"),
          array().cast("array<struct<main: string, midsub: string, sub: string>>"))
          .as("indexing"))
  }

  /** DuckDB CTE equivalent of [[indexTriples]]. */
  val indexTriplesSql: String =
    """triples AS (
      SELECT DISTINCT 'doc-' || l_orderkey AS documentID,
             p_name AS main, p_brand AS midsub, p_type AS sub
      FROM lineitem JOIN part ON l_partkey = p_partkey)"""
}

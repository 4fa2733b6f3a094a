package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ConvertName, Text}

/** Graph-build stage (json_to_db.py, SURVEY O23-O29): the labeled
  * property graph as two DataFrames — nodes(label, key, uri) and
  * edges(src, dst, type) — with MERGE semantics as key-based dedup, so
  * re-running the build is idempotent (SURVEY §2.3-7). Written as
  * partitioned parquet by the sink; a live Bolt writer would be a
  * foreachPartition behind a sink trait with batched UNWIND statements
  * (the reference's 1-tx-per-statement pattern is the anti-pattern we
  * do not port, json_to_db.py:81-127).
  *
  * Faithful trap semantics:
  *   - Term nodes carry no uri (generate_uri.py:43-45, json_to_db.py:35-38);
  *   - every midsub/sub child is created as a Term node regardless of its
  *     classified type (json_to_db.py:121-127 create_term);
  *   - MIDSUB/SUB *edges* only materialize when the parent main term is
  *     term-typed: relate_sub_term matches the parent by a `term`
  *     property (json_to_db.py:62-68), which Person/Place/Organization
  *     nodes do not have (they are created with name+uri,
  *     json_to_db.py:17-32), so the Cypher MATCH finds nothing and the
  *     MERGE never runs for entity-typed parents.
  */
object Graph {

  private def norm = Text.normTerm _

  private def convertedAuthor(c: String) = ConvertName.asUdf(col(c))

  /** All six node labels, deduplicated on (label, key, uri). */
  def nodes(flatDocs: DataFrame, labeled: DataFrame): DataFrame = {
    val nullUri = lit(null).cast("string")
    val docs = flatDocs.select(lit("Document").as("label"),
      col("documentID").as("key"), nullUri.as("uri"))
    // update_json converts every author/recipient name (O21) before URIs
    // are minted from the converted form (generate_uri.py:51-57).
    // The reference loops over present entities only (empty author list /
    // missing location emit nothing, json_to_db.py:84-95) -> null-filter.
    def docEntity(field: String, label: String, convert: Boolean) = {
      val name = if (convert) convertedAuthor(field) else col(field)
      flatDocs.filter(col(field).isNotNull)
        .select(lit(label).as("label"), name.as("key"),
          Text.uriHash(name).as("uri"))
    }
    val authors = docEntity("author", "Person", convert = true)
    val recipients = docEntity("recipient", "Person", convert = true)
    val places = docEntity("loc", "Place", convert = false)
    def mainEntity(t: String, label: String) = labeled
      .filter(col("main_type") === t)
      .select(lit(label).as("label"), col("main").as("key"),
        Text.uriHash(col("main")).as("uri"))
    val termMains = labeled.filter(col("main_type") === "term")
      .select(lit("Term").as("label"), col("main").as("key"), nullUri.as("uri"))
    val subTerms = labeled.select(col("midsub").as("key"))
      .union(labeled.select(col("sub")))
      .filter(col("key").isNotNull && col("key") =!= "")
      .select(lit("Term").as("label"), col("key"), nullUri.as("uri"))
    val dates = flatDocs.select(col("date_from").as("key"))
      .union(flatDocs.select(col("date_to")))
      .filter(col("key").isNotNull && col("key") =!= "")
      .select(lit("Date").as("label"), col("key"), nullUri.as("uri"))

    docs
      .union(authors).union(recipients).union(places)
      .union(mainEntity("person", "Person"))
      .union(mainEntity("place", "Place"))
      .union(mainEntity("organization", "Organization"))
      .union(termMains).union(subTerms).union(dates)
      .distinct()
  }

  /** All eleven edge types, deduplicated on (src, dst, type). */
  def edges(flatDocs: DataFrame, labeled: DataFrame): DataFrame = {
    def docRole(field: String, role: String, convert: Boolean) = {
      val name = if (convert) convertedAuthor(field) else col(field)
      flatDocs.filter(col(field).isNotNull)
        .select(Text.uriHash(name).as("src"),
          col("documentID").as("dst"), lit(role).as("type"))
    }
    val author = docRole("author", "AUTHOR", convert = true)
    val recipient = docRole("recipient", "RECIPIENT", convert = true)
    val location = docRole("loc", "LOCATION", convert = false)
    def dateEdge(field: String, role: String) = flatDocs
      .filter(col(field).isNotNull && col(field) =!= "")
      .select(col("documentID").as("src"), col(field).as("dst"),
        lit(role).as("type"))
    def hasEntity(t: String, role: String) = labeled
      .filter(col("main_type") === t)
      .select(Text.uriHash(col("main")).as("src"),
        col("documentID").as("dst"), lit(role).as("type"))
    val hasTerm = labeled.filter(col("main_type") === "term")
      .select(col("documentID").as("src"), col("main").as("dst"),
        lit("HAS_TERM").as("type"))
    // Parent matched by `term` property -> only term-typed mains (see
    // class doc); child is the midsub/sub string.
    def subEdge(field: String, role: String) = labeled
      .filter(col("main_type") === "term"
        && col(field).isNotNull && col(field) =!= "")
      .select(col("main").as("src"), col(field).as("dst"),
        lit(role).as("type"))

    author.union(recipient).union(location)
      .union(dateEdge("date_from", "DATE_FROM"))
      .union(dateEdge("date_to", "DATE_TO"))
      .union(hasEntity("person", "HAS_PERSON"))
      .union(hasEntity("place", "HAS_PLACE"))
      .union(hasEntity("organization", "HAS_ORGANIZATION"))
      .union(hasTerm)
      .union(subEdge("midsub", "MIDSUB"))
      .union(subEdge("sub", "SUB"))
      .distinct()
  }

  /** Partitioned graph sink (O29): one parquet dataset per label/type. */
  def writeGraph(nodesDf: DataFrame, edgesDf: DataFrame, outDir: String): Unit = {
    nodesDf.write.mode("overwrite").partitionBy("label").parquet(s"$outDir/nodes")
    edgesDf.write.mode("overwrite").partitionBy("type").parquet(s"$outDir/edges")
  }
}

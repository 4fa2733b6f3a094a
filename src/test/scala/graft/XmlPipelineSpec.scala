package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.pipeline.{Classify, Graph, NestedEnrich, XmlDocs}

/** End-to-end reference semantics over a handcrafted XML fixture
  * (FIXTURES.md §A shape): paren strip, first-wins dedup in document
  * order, missing-element fallbacks, known-entity precedence, midsub
  * label isolation, convert_name on persons, URI rules, graph-build
  * traps, and MERGE idempotency (SURVEY §2.3).
  */
class XmlPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fixtureXml =
    """<root>
      |<document>
      |  <documentID>d1</documentID>
      |  <documentTitle>Letter One</documentTitle>
      |  <projectInfo>
      |    <publicationName>Papers</publicationName>
      |    <seriesName>S1</seriesName>
      |    <volumeInfo>V1</volumeInfo>
      |    <publisher>UVA</publisher>
      |    <formats><type>print</type><type>digital</type></formats>
      |  </projectInfo>
      |  <authors><author>Washington, George</author></authors>
      |  <recipients><recipient>Adams, John</recipient></recipients>
      |  <dates><date-from>1790-05-10</date-from><date-to>1790-05-12</date-to></dates>
      |  <location><placeName> New York </placeName></location>
      |  <repositories><repository>LoC</repository></repositories>
      |  <indexing>
      |    <indexTerm><main>Congress (federal)</main><midsub>committees</midsub><sub>reports (draft)</sub></indexTerm>
      |    <indexTerm><main>Congress (federal)</main><midsub>committees</midsub><sub>reports (draft)</sub></indexTerm>
      |    <indexTerm><main>Congress (federal)</main><midsub>committees</midsub></indexTerm>
      |    <indexTerm><main>Washington, George</main></indexTerm>
      |    <indexTerm><main>Virginia</main></indexTerm>
      |    <indexTerm><main>taxes</main><midsub>New York</midsub></indexTerm>
      |  </indexing>
      |</document>
      |<document>
      |  <documentID>d2</documentID>
      |  <documentTitle>Letter Two</documentTitle>
      |  <authors><author>Steuben, Baron von</author></authors>
      |  <recipients></recipients>
      |  <dates><date-from>1791-01-01</date-from></dates>
      |  <indexing></indexing>
      |</document>
      |</root>
      |""".stripMargin

  private val mock = new Classify.MockClassifier(Map(
    "congress" -> "organization",
    "committees" -> "place", // midsub classified 'place' -> uri, still a Term node
    "virginia" -> "place",
    "reports" -> "term",
    "taxes" -> "term"))
    // note: "new york" is a KNOWN entity (location) -> pruned from the
    // classifier input; as a midsub it must STILL label 'term' (§2.3-4)

  private lazy val docModel = {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/fixture.xml"), fixtureXml)
    XmlDocs.toDocModel(XmlDocs.read(spark, s"$dir/fixture.xml"))
      .cache()
  }

  private lazy val b3 = NestedEnrich.addUris(NestedEnrich.enrich(docModel, mock))

  private def indexingOf(docId: String): Seq[Row] =
    b3.filter(col("documentID") === docId)
      .select(explode(col("indexing")).as("t")).select("t.*")
      .collect().toSeq

  test("doc model: paren strip + first-wins dedup in document order") {
    val terms = docModel.filter(col("documentID") === "d1")
      .select(explode(col("indexing")).as("t"))
      .select("t.main", "t.midsub", "t.sub")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(terms == Seq(
      ("Congress", "committees", "reports"),
      ("Congress", "committees", ""),
      ("Washington, George", "", ""),
      ("Virginia", "", ""),
      ("taxes", "New York", "")))
  }

  test("doc model: missing elements fall back like the reference") {
    val d2 = docModel.filter(col("documentID") === "d2").collect().head
    assert(d2.getAs[Row]("location") == null)
    assert(d2.getAs[Row]("projectInfo").getAs[String]("publisher") == null)
    assert(d2.getAs[scala.collection.Seq[Row]]("recipients").isEmpty)
    assert(d2.getAs[scala.collection.Seq[Row]]("indexing").isEmpty)
    assert(d2.getAs[Row]("dates").getAs[String]("date-to") == null)
  }

  test("enrich: precedence, midsub isolation, convert_name, uris") {
    val d1 = indexingOf("d1").map { r =>
      (r.getAs[String]("term"), r.getAs[String]("type"), r.getAs[String]("uri"),
        Option(r.getAs[Row]("midsub")).map(m =>
          (m.getString(0), m.getString(1), m.getString(2))))
    }
    // main: known beats api ('Washington, George' is a known person ->
    // converted + uri of the CONVERTED name); api labels Congress/Virginia;
    // midsub 'committees' -> api 'place' (uri attached, §2.4 recursion);
    // midsub 'New York' is known-place but midsub never consults known ->
    // pruned from api input -> falls back to 'term', NO uri.
    assert(d1 == Seq(
      ("Congress", "organization", "r35079197",
        Some(("committees", "place", "r5023761"))),
      ("Congress", "organization", "r35079197",
        Some(("committees", "place", "r5023761"))),
      ("George Washington", "person", "r88482195", None),
      ("Virginia", "place", "r72593898", None),
      ("taxes", "term", null, Some(("New York", "term", null)))))
  }

  test("enrich: authors/recipients converted incl. title quirk") {
    val rows = b3.orderBy("documentID")
      .select(expr("authors[0].name"), expr("authors[0].uri"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(
      ("George Washington", "r88482195"),
      ("Baron von  de Steuben", "r50750406")))
  }

  private lazy val flatDocs = XmlDocs.toFlatDocs(docModel)
  private lazy val labeled = {
    val triples = XmlDocs.toTriples(docModel)
    val known = NestedEnrich.knownEntities(docModel)
    val api = Classify.apiMap(Classify.allTerms(triples), known, mock)
    Classify.labelTriples(triples, known, api)
  }

  test("graph: Term nodes for every midsub/sub; no uri on Terms") {
    val nodes = Graph.nodes(flatDocs, labeled)
    val termKeys = nodes.filter(col("label") === "Term")
      .select("key", "uri").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // 'committees' is place-typed as a midsub but create_term still runs
    // (json_to_db.py:121-127); Terms never carry uris.
    assert(termKeys == Set(("committees", null), ("reports", null),
      ("taxes", null), ("New York", null)))
    val personKeys = nodes.filter(col("label") === "Person")
      .select("key").collect().map(_.getString(0)).toSet
    assert(personKeys == Set("George Washington", "John Adams",
      "Baron von  de Steuben"))
  }

  test("graph: MIDSUB/SUB edges only under term-typed parents") {
    val edges = Graph.edges(flatDocs, labeled)
    val subEdges = edges.filter(col("type").isin("MIDSUB", "SUB"))
      .select("src", "dst", "type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // Congress (organization) has midsub/sub children but relate_sub_term
    // matches the parent by a `term` property Person/Place/Organization
    // nodes lack -> only 'taxes' (term-typed) emits a MIDSUB edge.
    assert(subEdges == Set(("taxes", "New York", "MIDSUB")))
  }

  test("graph: MERGE idempotency — double build equals single build") {
    val n1 = Graph.nodes(flatDocs, labeled)
    val twice = Graph.nodes(flatDocs.union(flatDocs), labeled.union(labeled))
    assert(n1.count() == twice.count())
    assert(n1.exceptAll(twice).isEmpty && twice.exceptAll(n1).isEmpty)
    val e1 = Graph.edges(flatDocs, labeled)
    val eTwice = Graph.edges(flatDocs.union(flatDocs), labeled.union(labeled))
    assert(e1.exceptAll(eTwice).isEmpty && eTwice.exceptAll(e1).isEmpty)
  }
}

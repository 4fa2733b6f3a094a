package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Faithful re-implementation of the reference `convert_name`
  * (json_classification.py:40-67), "Last, First" -> "Titles First de Last".
  *
  * Bug-for-bug semantics preserved (SURVEY.md §2.3-1):
  *   - only names containing "," are considered; the split is on the
  *     literal ", " and only an exact 2-part split is rewritten;
  *   - title keywords are matched as *substrings*, scanned in the fixed
  *     list order ("Count" fires before "Countess" and consumes it);
  *     every occurrence of a matched keyword is removed (str.replace);
  *   - when any title matched, a literal " de " is inserted between the
  *     given name(s) and the family name.
  */
object ConvertName {

  /** json_classification.py:58 — exact list, exact order. */
  val titleKeywords: Seq[String] = Seq(
    "Baron", "Sir", "Dr.", "Lord", "Dame", "Count", "Countess", "King",
    "Queen", "Prince", "Princess", "Duke", "Duchess", "marquis",
    "marchioness", "von", "de")

  def apply(name: String): String = {
    if (name == null) return null
    if (!name.contains(",")) return name
    val parts = name.split(java.util.regex.Pattern.quote(", "), -1)
    if (parts.length != 2) return name
    val lastName = parts(0)
    var rest = parts(1)
    val titles = Seq.newBuilder[String]
    var any = false
    titleKeywords.foreach { kw =>
      if (rest.contains(kw)) {
        titles += kw
        any = true
        rest = rest.replace(kw, "").trim
      }
    }
    if (any) s"${titles.result().mkString(" ")} $rest de $lastName"
    else s"$rest $lastName"
  }

  /** Column-level form. A Scala UDF (not built-ins): the multi-keyword
    * substring scan with stateful re-assembly is not expressible as a
    * fixed-depth Column expression chain.
    */
  val asUdf: UserDefinedFunction = udf((s: String) => apply(s))
}

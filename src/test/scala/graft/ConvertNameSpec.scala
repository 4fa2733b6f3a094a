package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ConvertName

/** Golden vectors captured by executing the reference's convert_name
  * (json_classification.py:40-67) — bug-for-bug, including substring
  * title matches consuming letters of the given name and the literal
  * " de " insertion (SURVEY §2.3-1).
  */
class ConvertNameSpec extends AnyFunSuite {

  private val goldens = Seq(
    "Washington, George" -> "George Washington",
    "Adams, John" -> "John Adams",
    // both "Baron" and "von" match; remainder is empty -> double space
    "Steuben, Baron von" -> "Baron von  de Steuben",
    "Lafayette, marquis de" -> "marquis de  de Lafayette",
    // "de" matches INSIDE "Alexander" and is removed from it
    "Humboldt, Alexander von" -> "von de Alexanr de Humboldt",
    "Carter, Dr. James" -> "Dr. James de Carter",
    "Norfolk, Duke of" -> "Duke of de Norfolk",
    "Tudor, Queen Mary" -> "Queen Mary de Tudor",
    // "Count" fires before "Countess" and consumes its prefix
    "X, Countess Emma" -> "Count ess Emma de X",
    "Mountbatten, Princess Alice" -> "Prince ss Alice de Mountbatten",
    "Y, Dame Judi" -> "Dame Judi de Y",
    "Z, Lord Byron" -> "Lord Byron de Z",
    "Habsburg, King Charles" -> "King Charles de Habsburg",
    "W, Duchess Georgiana" -> "Duchess Georgiana de W",
    "V, marchioness Vera" -> "marchioness Vera de V",
    "X, Count Y" -> "Count Y de X",
    "O'Neill, Sir Henry" -> "Sir Henry de O'Neill",
    "Frederick, Prince de Conde" -> "Prince de Con de Frederick",
    "B, von der Decken" -> "von de r Decken de B",
    // pass-throughs: no comma, no ", " split, or >2 parts
    "Smith" -> "Smith",
    "NoComma Name" -> "NoComma Name",
    "A, B, C" -> "A, B, C",
    "Two, Parts, Three" -> "Two, Parts, Three",
    "Jefferson,Thomas" -> "Jefferson,Thomas",
    "" -> "",
    "De Witt, Cornelius" -> "Cornelius De Witt")

  test("convert_name matches the reference goldens") {
    goldens.foreach { case (in, want) =>
      assert(ConvertName(in) == want, s"input: '$in'")
    }
  }

  test("null passes through") {
    assert(ConvertName(null) == null)
  }
}

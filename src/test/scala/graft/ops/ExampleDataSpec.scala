package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.types._

/** Goldens for the ported example-data accumulation protocol
  * (example_data.clj): print/binned accumulators + the early-stop loop.
  */
class ExampleDataSpec extends AnyFunSuite {
  import ExampleData._

  val schema = DocT(Map(
    "a" -> UnionT.of(IntT(0, 9), StrT(1, 4)),
    "b" -> BoolT))

  test("early-stop loop accepts rows exhibiting unseen pairs and stops when covered") {
    val rows = Iterator(
      """{"a": 1, "b": true}""",     // a:int + b:bool -> accepted
      """{"a": 2, "b": false}""",    // nothing new -> rejected
      """{"a": "x", "b": true}""",   // a:str -> accepted, board complete
      """{"a": 99, "b": false}"""    // never reached: loop stopped
    )
    val seen = scala.collection.mutable.Buffer[String]()
    val acc = new PrintAccumulator(seen += _)
    val (_, count) = processRows(schema, rows, acc)
    assert(seen.toSeq == Seq("""{"a": 1, "b": true}""", """{"a": "x", "b": true}"""))
    // early stop: the fourth row was never consumed
    assert(rows.hasNext)
    // reference count quirk (example_data.clj:82-87): starts at 1, so the
    // reported count is rows consumed + 1
    assert(count == 4)
    assert(acc.values.isEmpty)
  }

  test("rows with only out-of-schema novel pairs are still accepted (accept? board semantics)") {
    // reference accept? (example_data.clj:39-46): a pair NOT on the board
    // (get-in -> nil) counts as unseen, so {"z": ...} is appended even
    // though z is no target; termination still needs the TARGET pairs
    val rows = Iterator(
      """{"z": 1}""",               // out-of-board pair -> accepted
      """{"z": 2}""",               // (z, int) now on the board -> rejected
      """{"a": 1, "b": true}""",
      """{"a": "x"}"""
    )
    val seen = scala.collection.mutable.Buffer[String]()
    val (_, count) = processRows(schema, rows, new PrintAccumulator(seen += _))
    assert(seen.toSeq == Seq("""{"z": 1}""", """{"a": 1, "b": true}""", """{"a": "x"}"""))
    assert(count == 5) // all four consumed (+1 quirk): coverage completed on the last
  }

  test("empty input reports the reference's count of 1 and an empty accumulator") {
    val (acc, count) = processRows(schema, Iterator.empty,
      new BinnedExampleAccumulator)
    assert(count == 1L)
    assert(acc.values.isEmpty)
  }

  test("binned accumulator bins distinct rendered values per property, sorted") {
    val acc = new BinnedExampleAccumulator
    Seq(
      """{"a": 1, "b": true}""",
      """{"a": 2, "b": true}""",
      """{"a": 1, "c": "x"}""",
      """not json"""              // contributes nothing
    ).foreach(acc.append)
    val v = acc.values
    assert(v.keySet.toSeq == Seq("a", "b", "c")) // sorted
    assert(v("a") == Set("1", "2"))
    assert(v("b") == Set("true"))
    assert(v("c") == Set("\"x\""))
  }

  test("append returns its element (reference append! contract)") {
    assert(new PrintAccumulator(_ => ()).append("row") == "row")
    assert(new BinnedExampleAccumulator().append("""{"a":1}""") == """{"a":1}""")
  }

  test("local early-stop coverage agrees with the distributed formulation's targets") {
    // the pairs the loop considers ARE RepresentativeSample.coverageTargets
    assert(RepresentativeSample.coverageTargets(schema) ==
      Set(("a", "int"), ("a", "str"), ("b", "bool")))
  }
}

package graft

/** Driver-contract self-checks: these failing means the t1/t2 gates fail
  * regardless of engine correctness. */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rows at sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query (t2 gate consistency)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are stable and well-formed") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q_[a-z0-9_]+"), s"bad query name: $k")
    }
    assert(SparkEntry.queries.size >= 62)
    assert(SparkEntry.oracleSql.size >= 50)
  }

  test("every query output is sortable scalars (driver compare sorts+hashes rows)") {
    // The driver's pandas compare sorts every column; an array/map/struct
    // column makes the sort throw and voids the whole query's check.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).schema.fields.foreach { f =>
        assert(!f.dataType.isInstanceOf[ArrayType] &&
               !f.dataType.isInstanceOf[MapType] &&
               !f.dataType.isInstanceOf[StructType],
          s"$name column '${f.name}' is non-scalar ${f.dataType.simpleString}")
      }
    }
  }
}

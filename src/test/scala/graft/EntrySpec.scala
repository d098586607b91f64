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
    assert(SparkEntry.queries.size >= 75)
    assert(SparkEntry.oracleSql.size >= 71)
  }

  test("every query output is sortable scalars (driver compare sorts+hashes rows)") {
    // The driver's pandas compare sorts every column; whitelist the atomic
    // types known to sort/hash cleanly there — anything else (array, map,
    // struct, interval, ...) voids the whole query's check.
    import org.apache.spark.sql.types._
    val sortable: Set[DataType] = Set(
      BooleanType, ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, StringType, BinaryType, DateType, TimestampType)
    val dir = "/root/testdata/sf0.001"
    // Accumulate across queries: a single bad query (or one that fails
    // analysis) reports by name instead of aborting the sweep at the first
    // exception. DataContractSpec owns the analyzes-at-all check.
    val problems = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, dir).schema.fields.collect {
          case f if !sortable.contains(f.dataType) && !f.dataType.isInstanceOf[DecimalType] =>
            s"$name column '${f.name}' is not a known-sortable scalar: ${f.dataType.simpleString}"
        }
      } catch { case e: Exception =>
        Seq(s"$name fails analysis: ${e.getMessage.linesIterator.take(1).mkString}")
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("cached-fixture lifecycle queries are rep-stable (bench reps 2+ hash identically)") {
    // Bench runs each lambda 3×; these five share a per-process fixture
    // (r18 — the q_db_retract_keyed precedent extended), so a re-run is
    // a zero-match probe over the post-takedown/post-expiry state. The
    // contract that keeps the answer hash stable across reps is value
    // identity of the COLLECTED result — pin it query by query.
    // q_retract_reingest / q_retract_clip_reingest run each rep on a
    // fresh byte-level CLONE of a once-built template (appends make
    // them non-idempotent); the same value-identity contract applies.
    val dir = "/root/testdata/sf0.001"
    Seq("q_expire", "q_expire_by_time", "q_retract_pruned",
      "q_retract_pruned_str", "q_db_retract",
      "q_retract_reingest", "q_retract_clip_reingest").foreach { name =>
      val fn = SparkEntry.queries(name)
      val first = fn(spark, dir).collect().map(_.toString).sorted.toSeq
      val second = fn(spark, dir).collect().map(_.toString).sorted.toSeq
      assert(first == second, s"$name drifted between reps")
      assert(first.nonEmpty, s"$name returned no rows")
    }
  }
}

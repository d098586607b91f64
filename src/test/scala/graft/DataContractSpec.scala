package graft

import org.apache.spark.sql.types._

/** Data contract for the driver-generated testdata: if the driver
  * regenerates `/root/testdata` with drifted column types (as happened in
  * round 6, when `events.ts` flipped from parquet TIMESTAMP(NANOS)-read-
  * as-long to timestamp[us]), this spec fails naming the table and the
  * offending column — instead of 14 queries silently erroring at the
  * correctness gate. Columns the engine reads schema-adaptively (the
  * timestamp family, see `EntryHelpers.tsCol`) accept every form the
  * adapter handles. */
class DataContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // both gate SFs: the t1 smoke runs at sf0.001, the t2 correctness gate
  // at sf0.01 — drift in either must fail here first
  private val contractDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** Forms `SparkEntry`'s schema-adaptive timestamp access supports. */
  private val tsForms: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)

  private def check(table: String, expected: Map[String, Either[DataType, Set[DataType]]]): Unit =
    contractDirs.foreach { d =>
      val schema = spark.read.parquet(s"$d/$table.parquet").schema
      val actual = schema.fields.map(f => f.name -> f.dataType).toMap
      val problems = expected.flatMap { case (colName, want) =>
        actual.get(colName) match {
          case None => Some(s"$d $table.$colName: MISSING (have ${schema.fieldNames.mkString(",")})")
          case Some(dt) => want match {
            case Left(one) if dt != one =>
              Some(s"$d $table.$colName: ${dt.simpleString}, contract requires ${one.simpleString}")
            case Right(set) if !set.contains(dt) =>
              Some(s"$d $table.$colName: ${dt.simpleString}, adapter handles only ${set.map(_.simpleString).mkString("|")}")
            case _ => None
          }
        }
      }
      assert(problems.isEmpty, problems.mkString("\n"))
    }

  private def exact(pairs: (String, DataType)*): Map[String, Either[DataType, Set[DataType]]] =
    pairs.map { case (n, t) => n -> (Left(t): Either[DataType, Set[DataType]]) }.toMap

  test("events columns match the engine's expectations") {
    check("events", exact(
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
      + ("ts" -> Right(tsForms)))
  }

  test("lineitem/orders date columns are a supported timestamp form") {
    check("lineitem", exact(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType, "l_linestatus" -> StringType)
      + ("l_shipdate" -> Right(tsForms + DateType)))
    check("orders", exact(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderpriority" -> StringType)
      + ("o_orderdate" -> Right(tsForms + DateType)))
  }

  test("documents and embeddings columns match the engine's expectations") {
    check("documents", exact(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    check("embeddings", exact(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }

  test("dimension tables match the engine's expectations") {
    check("customer", exact("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    check("supplier", exact("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    check("part", exact("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
    check("nation", exact("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    check("region", exact("r_regionkey" -> IntegerType, "r_name" -> StringType))
  }

  test("every registered query analyzes against the current testdata (per-query report)") {
    // Catch per query so one drifted column reports every affected query by
    // name, not just the first one the Map iterator happens to hit.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).schema; None }
      catch { case e: Exception =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.take(2).mkString(" / ")}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }
}

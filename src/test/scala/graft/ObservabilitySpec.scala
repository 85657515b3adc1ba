package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Observability

/** `Dataset.observe` accounting: metrics ride the one real pass. */
class ObservabilitySpec extends SparkSpec {

  test("gatedWithAccounting reports in/kept rows+chars from ONE scan") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val (kept, inObs, outObs) =
      Observability.gatedWithAccounting(docs, minChars = 200)

    // the plan keeps exactly one file scan — the metrics are free
    val plan = kept.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan.take(800))
    assert(plan.contains("CollectMetrics"), plan.take(800))

    val nKeptAction = kept.count() // the one action
    val in = inObs.get
    val out = outObs.get

    // ground truth via independent aggregates
    val truthIn = docs.agg(count(lit(1)), sum(length(col("text"))))
      .collect()(0)
    val truthOut = docs.filter(length(col("text")) >= 200)
      .agg(count(lit(1)), sum(length(col("text")))).collect()(0)

    assert(in("rows_in") == truthIn.getLong(0))
    assert(in("chars_in") == truthIn.getLong(1))
    assert(out("rows_kept") == truthOut.getLong(0))
    assert(out("chars_kept") == truthOut.getLong(1))
    assert(nKeptAction == truthOut.getLong(0))
    assert(truthOut.getLong(0) < truthIn.getLong(0),
      "fixture should have docs on both sides of the gate")
  }

  test("observed metrics see exactly the rows at their attach point") {
    import spark.implicits._
    val df = (1 to 100).toDF("v")
    val (seen, obs) = Observability.observed(df, "mid",
      "n" -> count(lit(1)), "s" -> sum(col("v")))
    // a filter BELOW the observe point must not change what it sees;
    // one ABOVE must
    val downstream = seen.filter(col("v") > 90)
    assert(downstream.count() == 10)
    assert(obs.get("n") == 100L)
    assert(obs.get("s") == 5050L)
  }
}

package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PSI semantics: identical snapshots score 0, vanished/appeared categories
  * are ε-floored (finite), the scalar gate orders drifts correctly, and the
  * snapshots are never row-joined. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (String, Int)*) =
    rows.toSeq.flatMap { case (b, n) => Seq.fill(n)(b) }.toDF("lang")

  test("identical distributions have PSI 0 in every bucket") {
    val a = snap("en" -> 50, "de" -> 30, "fr" -> 20)
    val out = Drift.psiByBucket(a, a, $"lang")
      .select($"psi_term").as[Double].collect()
    assert(out.forall(_ === 0.0))
    assert(Drift.psi(a, a, $"lang").first().getDouble(0) === 0.0)
  }

  test("a vanished category contributes a finite eps-floored term") {
    val ref = snap("en" -> 50, "zh" -> 50)
    val neu = snap("en" -> 100)
    val terms = Drift.psiByBucket(ref, neu, $"lang")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(terms("zh") > 0.0 && !terms("zh").isInfinite)
    // p_new floored at eps=1e-4: term = (1e-4 - 0.5) * ln(1e-4/0.5)
    val expected = math.rint((1e-4 - 0.5) * math.log(1e-4 / 0.5) * 1e6) / 1e6
    assert(math.abs(terms("zh") - expected) < 1e-9)
  }

  test("a null category present in both snapshots is one matched bucket, not vanished+appeared") {
    val withNulls = (Seq.fill(90)(Some("en")) ++ Seq.fill(10)(Option.empty[String]))
      .toDF("lang")
    val out = Drift.psiByBucket(withNulls, withNulls, $"lang").collect()
    assert(out.length === 2) // en + the null bucket, once each
    assert(out.forall(_.getDouble(3) === 0.0)) // identical snapshots → zero drift
    assert(Drift.psi(withNulls, withNulls, $"lang").first().getDouble(0) === 0.0)
  }

  test("bigger shifts score bigger PSI (the gate actually orders drift)") {
    val ref = snap("en" -> 50, "de" -> 50)
    val mild = snap("en" -> 55, "de" -> 45)
    val wild = snap("en" -> 90, "de" -> 10)
    val pMild = Drift.psi(ref, mild, $"lang").first().getDouble(0)
    val pWild = Drift.psi(ref, wild, $"lang").first().getDouble(0)
    assert(pMild > 0.0 && pWild > pMild)
  }

  test("plan never row-joins the snapshots: only bucket tables meet") {
    val ref = snap("en" -> 50, "de" -> 50)
    val neu = snap("en" -> 60, "de" -> 40)
    val plan = Drift.psiByBucket(ref, neu, $"lang").queryExecution.executedPlan.toString
    // both sides aggregate before any join: the join keys are bucket strings
    assert(!plan.contains("CartesianProduct"), plan)
    val aggBeforeJoin = "HashAggregate".r.findAllIn(plan).size >= 4 // 2 per dist()
    assert(aggBeforeJoin, plan)
  }
}

package graft

import graft.operators.Agreement

class AgreementSpec extends SparkTestBase {
  import spark.implicits._

  test("kappa matches the textbook value on a hand-computed matrix") {
    // classic 2x2 example: a=20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val df = rows.toDF("gold", "pred")
    val out = Agreement.confusionWithKappa(df, "gold", "pred")
      .orderBy("a", "b").collect()
    assert(out.length == 4)
    val r = out.head
    assert(r.getAs[Long]("n_total") == 50L && r.getAs[Long]("n_agree") == 35L)
    // po = 35/50, pe = (25*30 + 25*20)/2500 = 0.5 -> kappa = (0.7-0.5)/0.5 = 0.4
    // exact rational: (50*35 - 1250) / (2500 - 1250) = 500/1250
    assert(out.forall(_.getAs[Double]("kappa") == 500.0 / 1250.0))
    val m = out.map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(m == Map(("y", "y") -> 20L, ("y", "n") -> 5L, ("n", "y") -> 10L, ("n", "n") -> 15L))
    // marginals ride on each cell
    val yy = out.find(x => x.getString(0) == "y" && x.getString(1) == "y").get
    assert(yy.getAs[Long]("row_total") == 25L && yy.getAs[Long]("col_total") == 30L)
  }

  test("perfect agreement yields kappa 1, label never predicted keeps marginals honest") {
    val df = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("g", "p")
    val out = Agreement.confusionWithKappa(df, "g", "p").collect()
    assert(out.forall(_.getAs[Double]("kappa") == 1.0))
    // disjoint labels: zero diagonal, kappa < 0 is possible; just exactness
    val dj = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("g", "p")
    val o2 = Agreement.confusionWithKappa(dj, "g", "p").collect()
    // N=3, A=0, E = ra*cb for shared labels a,b: row a=2,col a=1; row b=1,col b=2 -> E=2+2=4
    // kappa = (0-4)/(9-4) = -0.8
    assert(o2.forall(_.getAs[Double]("kappa") == -4.0 / 5.0))
  }
}

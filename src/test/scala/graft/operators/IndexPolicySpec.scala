package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins of the index-family auto-selection ladder (q522's operator):
  * the four rungs at their gated operating points, and MONOTONICITY
  * along every axis — a planner whose choice can oscillate as a
  * count grows is not a policy, it's a coin.
  */
class IndexPolicySpec extends AnyFunSuite {
  import IndexPolicy._

  private val Big = 1000000000L
  private val Dim = 16

  test("the four rungs at q522's sf0.01 operating points") {
    assert(choose(500, Dim, 25, Big) === Flat) // 5% predicate
    assert(choose(500, Dim, 250, Big) === Ivf) // 50% predicate
    assert(choose(500, Dim, 500, Big) === Graph) // unfiltered, fits
    assert(choose(500, Dim, 500, 10000L) === IvfPq) // 64 KB > 10 KB
  }

  test("sf0.1 re-derivation: tiny_filter crosses the switch to ivf") {
    assert(choose(5000, Dim, 250, Big) === Ivf)
    assert(choose(5000, Dim, 5000, Big) === Graph)
    assert(choose(5000, Dim, 5000, 10000L) === IvfPq)
  }

  test("monotone in allowed: shrinking allowed only moves toward flat") {
    // rank the ladder by 'distance from flat'
    def rank(f: String): Int = f match {
      case Flat => 0; case Ivf => 1; case Graph => 1; case IvfPq => 2
    }
    for (n <- Seq(100L, 500L, 5000L); b <- Seq(10000L, Big)) {
      val choices = (0L to n).map(a => choose(n, Dim, a, b))
      // flat is a PREFIX of the allowed axis: once a >= switch, never
      // flat again
      val flatIdx = choices.zipWithIndex.filter(_._1 == Flat).map(_._2)
      assert(flatIdx === (0L until math.min(SwitchBelow, n + 1))
        .map(_.toInt))
      // and the WHOLE sequence is rank-non-decreasing — an
      // oscillation anywhere along the axis (e.g. ivf → flat → ivf)
      // is the coin-not-a-policy failure this spec exists to forbid
      val ranks = choices.map(rank)
      assert(ranks.zip(ranks.tail).forall { case (a, c) => a <= c },
        s"rank oscillation along allowed axis at n=$n b=$b: $choices")
    }
  }

  test("monotone in budget: once ivfpq at budget b, ivfpq below b") {
    for (n <- Seq(200L, 500L, 5000L)) {
      val budgets = Seq(1L, 100L, 10000L, 63999L, 64000L, 64001L,
        1000000L, Big).filter(_ > 0)
      val choices = budgets.map(b => choose(n, Dim, n, b))
      // ivfpq forms a prefix of the ascending-budget axis
      val lastPq = choices.lastIndexOf(IvfPq)
      assert(choices.take(lastPq + 1).forall(_ == IvfPq))
      // and the boundary sits exactly at rawBytes
      assert(choose(n, Dim, n, rawBytes(n, Dim)) !== IvfPq)
      assert(choose(n, Dim, n, rawBytes(n, Dim) - 1) === IvfPq)
    }
  }

  test("monotone in n at fixed budget: growth only moves toward ivfpq") {
    val b = 64000L // 500 vectors' worth
    val ns = Seq(200L, 499L, 500L, 501L, 5000L, 50000L)
    val choices = ns.map(n => choose(n, Dim, n, b))
    val firstPq = choices.indexOf(IvfPq)
    assert(firstPq >= 0)
    assert(choices.drop(firstPq).forall(_ == IvfPq))
  }

  test("filtered vs unfiltered at equal fit: graph only when allowed = n") {
    assert(choose(1000, Dim, 1000, Big) === Graph)
    assert(choose(1000, Dim, 999, Big) === Ivf)
    assert(choose(1000, Dim, 150, Big) === Ivf)
    assert(choose(1000, Dim, 149, Big) === Flat)
  }

  test("degenerate inputs guarded") {
    intercept[IllegalArgumentException](choose(-1, Dim, 0, Big))
    intercept[IllegalArgumentException](choose(10, Dim, 11, Big))
    intercept[IllegalArgumentException](choose(10, 0, 5, Big))
    intercept[IllegalArgumentException](choose(10, Dim, 5, 0))
    assert(choose(0, Dim, 0, Big) === Flat) // empty corpus: exact scan
  }
}

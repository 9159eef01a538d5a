package graft.operators

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("marketBasket: known confidence and lift on a planted catalog") {
    // 4 baskets: {x,y} {x,y} {x,z} {y}
    //   n(x)=3, n(y)=3, n(z)=1, total=4
    //   (x,y): pair_n=2, conf x->y = 2/3, conf y->x = 2/3,
    //          lift = 2*4/(3*3) = 8/9
    //   (x,z): pair_n=1 -> pruned at minSupport=2
    val lines = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"), // duplicate line: distinct first
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")
    ).toDF("basket", "item")
    val got = Association.marketBasket(lines, "basket", "item", minSupport = 2L)
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (a, b, n, cab, cba, lift) = got.head
    assert((a, b, n) == (("x", "y", 2L)))
    assert(cab == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(cba == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(lift == math.rint(8.0 / 9.0 * 1e6) / 1e6)
  }

  test("marketBasket: pair blowup is per-basket, pruning respects minSupport") {
    // one wide basket of 6 items -> 15 pairs, each support 1; a second
    // basket repeats two of them
    val wide = (1 to 6).map(i => (1L, s"i$i")) ++ Seq((2L, "i1"), (2L, "i2"))
    val got = Association.marketBasket(wide.toDF("basket", "item"),
      "basket", "item", minSupport = 1L)
    assert(got.count() == 15)
    assert(Association.marketBasket(wide.toDF("basket", "item"),
      "basket", "item", minSupport = 2L).count() == 1)
  }
}

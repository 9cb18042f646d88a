package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("attaches the whole latest right row — null fields are not backfilled from older rows") {
    // right: at ts=20 the latest row has a=NULL; a real ASOF JOIN must
    // surface that NULL, never mix in a=1 from the ts=10 row
    val right = Seq(
      (1L, 10L, Option(1), "x"),
      (1L, 20L, Option.empty[Int], "y")
    ).toDF("k", "ts", "a", "b")
    val left = Seq((1L, 25L, "L1"), (1L, 15L, "L2"), (1L, 5L, "L3"))
      .toDF("k", "ts", "tag")
    val out = AsOfJoin.asofLeft(left, right, "k", "ts")
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[Any]("a")), Option(r.getAs[Any]("b")))).toMap
    assert(out("L1") == (None, Some("y")), s"ts=25 must take the whole ts=20 row: ${out("L1")}")
    assert(out("L2") == (Some(1), Some("x")))
    assert(out("L3") == (None, None), "no prior right row → all payload null")
  }

  test("equal timestamps resolve to the right row (<= semantics)") {
    val right = Seq((1L, 10L, 7)).toDF("k", "ts", "v")
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val out = AsOfJoin.asofLeft(left, right, "k", "ts").collect()
    assert(out.head.getAs[Int]("v") == 7)
  }

  test("keys without any right rows survive with null payload") {
    val right = Seq((1L, 10L, 7)).toDF("k", "ts", "v")
    val left = Seq((2L, 50L)).toDF("k", "ts")
    val out = AsOfJoin.asofLeft(left, right, "k", "ts").collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("v")))
  }
}

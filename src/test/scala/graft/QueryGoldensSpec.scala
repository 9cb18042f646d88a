package graft

import graft.tools.QueryGoldens

import java.nio.charset.StandardCharsets

/** Replay gate for the queries DuckDB can't oracle (model-/expression-
  * defined semantics): each pinned query at sf0.001 must reproduce its
  * frozen canonical dump byte-for-byte. Regenerate via
  * `runMain graft.tools.FreezeQueryGoldens` ONLY on intentional change. */
class QueryGoldensSpec extends SparkSpecBase {

  for (name <- QueryGoldens.pinned) {
    test(s"$name reproduces its frozen golden") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val got = QueryGoldens.canonical(df)
      val res = getClass.getResourceAsStream(s"/goldens/queries/$name.txt")
      assert(res != null, s"golden missing — run graft.tools.FreezeQueryGoldens")
      val want = new String(res.readAllBytes(), StandardCharsets.UTF_8)
      assert(got == want, {
        val g = got.linesIterator.toVector
        val w = want.linesIterator.toVector
        val firstDiff = g.zipAll(w, "<missing>", "<missing>")
          .zipWithIndex.find { case ((a, b), _) => a != b }
        s"$name drifted from golden (got ${g.size} lines, want ${w.size}); " +
          s"first diff at ${firstDiff.map(_._2)}: ${firstDiff.map(_._1)}"
      })
    }
  }
}

package graft.lineage

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-fuzz of the lineage walker BEYOND the oracle corpus
  * (VERDICT r12 item 6): LineageCorpusSpec replays the engine's own
  * 201 oracle SQLs, but those are single statements over a fixed
  * table set. Here ScalaCheck composes multi-statement SCRIPTS —
  * multi-insert, CTE, theta-join, UNION, USE-db switches, bare
  * SELECTs — with broken statements interleaved, and asserts the
  * degradation contract as executable laws over the generated space:
  *
  *  - `parse` NEVER throws, whatever the script shape;
  *  - every broken statement is collected in `getErrors` as a
  *    Catalyst ParseException — exactly one error per broken
  *    statement, never more (a healthy statement must not error);
  *  - the healthy statements still contribute: input tables are
  *    EXACTLY the union of the referenced base tables (resolved
  *    against the USE-db state at that point in the script — the
  *    reference's fillDB rule, README.md:637-640), output tables
  *    exactly the insert destinations, and each INSERT-carrying
  *    statement yields at least one ColLine.
  */
class LineageFuzzSpec extends AnyFunSuite {

  /** One generated statement plus its expected contribution.
    * `ins`/`outs` hold UNQUALIFIED names with an Option[db] —
    * resolution against the running USE state happens in the fold. */
  private case class Frag(
      sql: String,
      ins: Set[(Option[String], String)],
      outs: Set[(Option[String], String)],
      nColLines: Int, // lower bound on ColLines this statement emits
      bad: Boolean,
      use: Option[String])

  private val dbs = Seq("dba", "dbb")
  private val srcGen: Gen[(Option[String], String)] = for {
    q <- Gen.option(Gen.oneOf(dbs))
    t <- Gen.oneOf("src0", "src1", "src2", "src3", "src4", "src5")
  } yield (q, t)
  private val outGen: Gen[(Option[String], String)] = for {
    q <- Gen.option(Gen.oneOf(dbs))
    t <- Gen.oneOf("out0", "out1", "out2", "out3", "out4", "out5")
  } yield (q, t)

  private def nameOf(t: (Option[String], String)): String =
    t._1.map(_ + ".").getOrElse("") + t._2

  private val insertJoin: Gen[Frag] = for {
    o <- outGen; a <- srcGen; b <- srcGen
  } yield Frag(
    s"INSERT INTO ${nameOf(o)} SELECT a.x, b.y FROM ${nameOf(a)} a " +
      s"JOIN ${nameOf(b)} b ON a.k = b.k",
    Set(a, b), Set(o), 2, bad = false, use = None)

  private val thetaJoin: Gen[Frag] = for {
    o <- outGen; a <- srcGen; b <- srcGen
  } yield Frag(
    s"INSERT INTO ${nameOf(o)} SELECT a.x FROM ${nameOf(a)} a " +
      s"JOIN ${nameOf(b)} b ON a.k < b.k OR a.j = b.j",
    Set(a, b), Set(o), 1, bad = false, use = None)

  private val unionAll: Gen[Frag] = for {
    o <- outGen; a <- srcGen; b <- srcGen
  } yield Frag(
    s"INSERT INTO ${nameOf(o)} SELECT x FROM ${nameOf(a)} " +
      s"UNION ALL SELECT x FROM ${nameOf(b)}",
    Set(a, b), Set(o), 1, bad = false, use = None)

  private val cteInsert: Gen[Frag] = for {
    o <- outGen; a <- srcGen; b <- srcGen
  } yield Frag(
    s"WITH c AS (SELECT k, x FROM ${nameOf(a)} WHERE x > 0) " +
      s"INSERT INTO ${nameOf(o)} SELECT c.x FROM c " +
      s"JOIN ${nameOf(b)} b ON c.k = b.k",
    Set(a, b), Set(o), 1, bad = false, use = None)

  private val multiInsert: Gen[Frag] = for {
    o1 <- outGen; o2 <- outGen; a <- srcGen
    if nameOf(o1) != nameOf(o2)
  } yield Frag(
    s"FROM ${nameOf(a)} INSERT OVERWRITE TABLE ${nameOf(o1)} SELECT x " +
      s"INSERT OVERWRITE TABLE ${nameOf(o2)} SELECT y",
    Set(a), Set(o1, o2), 2, bad = false, use = None)

  private val bareSelect: Gen[Frag] = for {
    a <- srcGen
  } yield Frag(
    s"SELECT x, count(1) FROM ${nameOf(a)} WHERE k > 0 GROUP BY x",
    Set(a), Set.empty, 0, bad = false, use = None)

  // round-14 widening (VERDICT r13 item 4): shapes SqlSurfaceSpec
  // executes but the fuzzer never composed — HAVING, window clauses,
  // nested CTE references — under the same degradation-contract laws.
  private val havingInsert: Gen[Frag] = for {
    o <- outGen; a <- srcGen; n <- Gen.chooseNum(1, 9)
  } yield Frag(
    s"INSERT INTO ${nameOf(o)} SELECT x, count(1) FROM ${nameOf(a)} " +
      s"WHERE k > 0 GROUP BY x HAVING count(1) > $n",
    Set(a), Set(o), 2, bad = false, use = None)

  private val windowInsert: Gen[Frag] = for {
    o <- outGen; a <- srcGen
    f <- Gen.oneOf("row_number()", "rank()", "sum(y)")
  } yield Frag(
    s"INSERT INTO ${nameOf(o)} SELECT x, " +
      s"$f OVER (PARTITION BY k ORDER BY y DESC) FROM ${nameOf(a)}",
    Set(a), Set(o), 2, bad = false, use = None)

  private val nestedCte: Gen[Frag] = for {
    o <- outGen; a <- srcGen; b <- srcGen
  } yield Frag(
    s"WITH c1 AS (SELECT k, x FROM ${nameOf(a)} WHERE x > 0), " +
      s"c2 AS (SELECT c1.k, c1.x FROM c1 JOIN ${nameOf(b)} b " +
      s"ON c1.k = b.k) " +
      s"INSERT INTO ${nameOf(o)} SELECT c2.x FROM c2 WHERE c2.k > 1",
    Set(a, b), Set(o), 1, bad = false, use = None)

  // round-15 widening (VERDICT r14 item 6): LATERAL VIEW / EXPLODE
  // and INSERT…PARTITION — SqlSurfaceSpec executes both on real
  // tables, but the fuzzer never composed them into scripts (with
  // USE-db switches and broken statements interleaved). Same
  // degradation-contract laws. The generator alias survives in the
  // ColLine qualifier (default.t.w — the generic fold's behavior,
  // deterministic), so the count bound is what the law pins.
  private val lateralViewInsert: Gen[Frag] = for {
    o <- outGen; a <- srcGen
  } yield Frag(
    s"INSERT INTO ${nameOf(o)} SELECT t.w, count(1) FROM ${nameOf(a)} " +
      "LATERAL VIEW explode(split(x, ' ')) t AS w GROUP BY t.w",
    Set(a), Set(o), 2, bad = false, use = None)

  private val partitionInsert: Gen[Frag] = for {
    o <- outGen; a <- srcGen; d <- Gen.chooseNum(1, 28)
  } yield Frag(
    s"INSERT OVERWRITE TABLE ${nameOf(o)} PARTITION (dt='2024-01-$d') " +
      s"SELECT x, y FROM ${nameOf(a)} WHERE k > $d",
    Set(a), Set(o), 2, bad = false, use = None)

  // round-16 widening: LATERAL VIEW composed with a CTE (the
  // goldens in LineageExtraSpec pin the rendered strings; here the
  // composition rides the script-level degradation laws). Both
  // orientations: the generator inside the CTE body, and over the
  // CTE reference.
  private val lateralCteInsert: Gen[Frag] = for {
    o <- outGen; a <- srcGen; inside <- Gen.oneOf(true, false)
  } yield Frag(
    if (inside)
      s"WITH c AS (SELECT t.w AS w FROM ${nameOf(a)} LATERAL VIEW " +
        s"explode(split(x, ' ')) t AS w) " +
        s"INSERT INTO TABLE ${nameOf(o)} SELECT w FROM c"
    else
      s"WITH c AS (SELECT x FROM ${nameOf(a)} WHERE k > 0) " +
        s"INSERT INTO TABLE ${nameOf(o)} SELECT t.w FROM c " +
        "LATERAL VIEW explode(split(x, ' ')) t AS w",
    Set(a), Set(o), 1, bad = false, use = None)

  private val useDb: Gen[Frag] = Gen.oneOf(dbs).map(d =>
    Frag(s"USE $d", Set.empty, Set.empty, 0, bad = false, use = Some(d)))

  private val broken: Gen[Frag] = Gen.chooseNum(0, 99).map(i =>
    Frag(s"SELECT [1,2,$i] FROM broken_$i", Set.empty, Set.empty, 0,
      bad = true, use = None))

  private val fragGen: Gen[Frag] = Gen.frequency(
    3 -> insertJoin, 2 -> thetaJoin, 2 -> unionAll, 2 -> cteInsert,
    2 -> multiInsert, 2 -> bareSelect, 1 -> useDb, 2 -> broken,
    2 -> havingInsert, 2 -> windowInsert, 2 -> nestedCte,
    2 -> lateralViewInsert, 2 -> partitionInsert, 2 -> lateralCteInsert)

  private val scriptGen: Gen[List[Frag]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, fragGen))

  test("scripted lineage laws hold over generated " +
      "multi-insert/CTE/theta/union/USE scripts") {
    val prop = Prop.forAll(scriptGen) { frags =>
      val script = frags.map(_.sql).mkString(";\n")
      val p = new LineParser().parse(script) // law 1: must not throw
      // fold the USE state exactly as fillDB does: unqualified names
      // take the db in force AT THAT STATEMENT, starting at default
      var db = "default"
      var expIn = Set.empty[String]
      var expOut = Set.empty[String]
      var expErr = 0
      var minCl = 0
      frags.foreach { f =>
        f.use.foreach(db = _)
        def res(t: (Option[String], String)) =
          s"${t._1.getOrElse(db)}.${t._2}"
        if (f.bad) expErr += 1
        else {
          expIn ++= f.ins.map(res)
          expOut ++= f.outs.map(res)
          minCl += f.nColLines
        }
      }
      val errsOk = p.getErrors.size == expErr &&
        p.getErrors.forall(_._2.startsWith("ParseException"))
      val insOk = p.getInputTables == expIn
      val outsOk = p.getOutputTables == expOut
      val clOk = p.getColLines.size >= minCl
      if (!(errsOk && insOk && outsOk && clOk))
        println(s"script:\n$script\nerrs=${p.getErrors} " +
          s"ins=${p.getInputTables} (exp $expIn) " +
          s"outs=${p.getOutputTables} (exp $expOut) " +
          s"cl=${p.getColLines.size} (min $minCl)")
      errsOk && insOk && outsOk && clOk
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, s"lineage script laws: ${r.status}")
  }
}

package graft.lineage

import org.scalatest.funsuite.AnyFunSuite

/** The reference's 7 golden lineage tests, ported verbatim
  * (/root/reference/README.md:851-1218): same SQL in, same
  * inputTables/outputTables/ColLine-(toNameParse, fromName,
  * conditionSet) out. These ARE the parity spec (FIXTURES.md §A).
  */
class LineageGoldenSpec extends AnyFunSuite {

  /** Stub schemas for tables the goldens reference (FIXTURES.md §A). */
  private val meta = MapMetaStore(Map(
    "app.hand_qq_passenger" -> Seq("statid", "channel"),
    "app.return_benefit_base_foo" -> Seq("id"),
  ))

  private def parser = new LineParser(meta)

  private def assertLines(got: List[ColLine],
      expected: Set[(String, String, Set[String])]): Unit = {
    val gotSet = got.map(c => (c.toNameParse, c.fromName, c.conditionSet)).toSet
    assert(gotSet == expected,
      s"\nGOT:\n${gotSet.mkString("\n")}\nEXPECTED:\n${expected.mkString("\n")}")
  }

  test("testParseAllColumn — select * with metadata expansion (README.md:867-895)") {
    val p = parser.parse(
      "use app;insert into table dest select statid from " +
        "(select * from hand_qq_passenger a join return_benefit_base_foo b on a.statid=b.id where a.channel > 10) base",
      validate = true)
    assert(p.getInputTables ==
      Set("app.hand_qq_passenger", "app.return_benefit_base_foo"))
    assert(p.getOutputTables == Set("app.dest"))
    val conds = Set(
      "WHERE:app.hand_qq_passenger.channel > 10",
      "JOIN:app.hand_qq_passenger.statid = app.return_benefit_base_foo.id")
    assertLines(p.getColLines,
      Set(("statid", "app.hand_qq_passenger.statid", conds)))
  }

  test("testParseWhere — >, in, or, <> (README.md:900-929)") {
    val p = parser.parse(
      "INSERT OVERWRITE table app.dest PARTITION (year='2015',month='10',day='$day') " +
        "select ip,name from test where age > 10 and area in (11,22) or name<>'$V_PARYMD'")
    assert(p.getInputTables == Set("default.test"))
    assert(p.getOutputTables == Set("app.dest"))
    val conds = Set(
      "WHERE:((default.test.age > 10 and default.test.area in (11,22)) or default.test.name <> '$V_PARYMD')")
    assertLines(p.getColLines, Set(
      ("ip", "default.test.ip", conds),
      ("name", "default.test.name", conds)))
  }

  test("testParseJoin — nvl, equi-join, to_date/date_sub (README.md:934-967)") {
    val p = parser.parse(
      "use app;insert into table dest select nvl(a.name,0) as name, b.ip  " +
        "from test a join test1 b on a.ip=b.ip where a.age > 10 and b.area in (11,22) and to_date(b.date) > date_sub('20151001',7)")
    assert(p.getInputTables == Set("app.test", "app.test1"))
    assert(p.getOutputTables == Set("app.dest"))
    val conds = Set(
      "WHERE:((app.test.age > 10 and app.test1.area in (11,22)) and to_date(app.test1.date) > date_sub('20151001',7))",
      "JOIN:app.test.ip = app.test1.ip")
    assertLines(p.getColLines, Set(
      ("ip", "app.test1.ip", conds),
      ("name", "app.test.name", conds + "COLFUN:nvl(app.test.name,0)")))
  }

  test("testParseMap — map/array subscripts, CONCAT, 1+1 (README.md:973-1015)") {
    val p = parser.parse(
      "use dw;insert into table dest select 1+1 as num, params['cid'] as maptest,arr[0] as arrtest,CONCAT(year,month,day) as date " +
        "from test ")
    assert(p.getInputTables == Set("dw.test"))
    assert(p.getOutputTables == Set("dw.dest"))
    assertLines(p.getColLines, Set(
      ("num", "", Set("COLFUN:1 + 1")),
      ("maptest", "dw.test.params", Set("COLFUN:dw.test.params['cid']")),
      ("arrtest", "dw.test.arr", Set("COLFUN:dw.test.arr[0]")),
      ("date", "dw.test.year,dw.test.month,dw.test.day",
        Set("COLFUN:CONCAT(dw.test.year,dw.test.month,dw.test.day)"))))
  }

  test("testParseUnion — union in FROM-subquery, & provenance (README.md:1025-1066)") {
    val p = parser.parse(
      "use default;use app;SELECT u.id, actions.date FROM ( " +
        "SELECT av.uid AS uid, av.date as date " +
        "FROM action_video av " +
        "WHERE av.date = '2010-06-03' " +
        "UNION ALL " +
        "SELECT ac.uid AS uid,ac.date as date " +
        "FROM fact.action_comment ac " +
        "WHERE ac.date = '2008-06-03' " +
        ") actions JOIN users u ON (u.id = actions.uid)")
    assert(p.getInputTables ==
      Set("app.users", "app.action_video", "fact.action_comment"))
    assert(p.getOutputTables == Set.empty[String])
    val conds = Set(
      "WHERE:app.action_video.date = '2010-06-03'",
      "WHERE:fact.action_comment.date = '2008-06-03'",
      "JOIN:app.users.id = app.action_video&fact.action_comment.uid")
    assertLines(p.getColLines, Set(
      ("id", "app.users.id", conds),
      ("date", "app.action_video&fact.action_comment.date", conds)))
  }

  test("testParseUnion2 — 3-way top-level union, positional merge (README.md:1068-1110)") {
    val p = parser.parse(
      "INSERT OVERWRITE TABLE target_table " +
        "SELECT name, id, \"Category159\"  FROM source_table_1 " +
        "UNION ALL " +
        "SELECT name, id,category FROM source_table_2 " +
        "UNION ALL " +
        "SELECT name, id, \"Category160\"  FROM source_table_3 where name=123")
    assert(p.getInputTables == Set("default.source_table_1",
      "default.source_table_2", "default.source_table_3"))
    assert(p.getOutputTables == Set("default.target_table"))
    val conds = Set("WHERE:default.source_table_3.name = 123")
    assertLines(p.getColLines, Set(
      ("name",
        "default.source_table_1.name,default.source_table_2.name,default.source_table_3.name",
        conds),
      ("id",
        "default.source_table_1.id,default.source_table_2.id,default.source_table_3.id",
        conds),
      ("category", "default.source_table_2.category",
        conds ++ Set("COLFUN:\"Category159\"", "COLFUN:\"Category160\""))))
  }

  test("testParse sql25 — multi-insert, theta+full-outer, case when, count distinct (README.md:1126-1171)") {
    val p = parser.parse(
      "from(select p.datekey datekey, p.userid userid, c.clienttype " +
        "from detail.usersequence_client c join fact.orderpayment p on (p.orderid > c.orderid or p.a = c.b) and p.aaa=c.bbb " +
        "full outer join dim.user du on du.userid = p.userid where p.datekey = '20131118' and (du.userid in (111,222) or hash(p.test) like '%123%')) base " +
        "insert overwrite table test.customer_kpi select concat(base.datekey,1,2) as aaa, " +
        "case when base.userid > 5 then base.clienttype when base.userid > 1 then base.datekey+5 else 1-base.clienttype end bbbaaa,count(distinct hash(base.userid)) buyer_count " +
        "where base.userid is not null group by base.datekey, base.clienttype")
    assert(p.getInputTables ==
      Set("detail.usersequence_client", "fact.orderpayment", "dim.user"))
    assert(p.getOutputTables == Set("test.customer_kpi"))
    val conds = Set(
      "JOIN:((fact.orderpayment.orderid > detail.usersequence_client.orderid or fact.orderpayment.a = detail.usersequence_client.b) and fact.orderpayment.aaa = detail.usersequence_client.bbb)",
      "WHERE:(fact.orderpayment.datekey = '20131118' and (dim.user.userid in (111,222) or hash(fact.orderpayment.test) like '%123%'))",
      "WHERE:fact.orderpayment.userid isnotnull",
      "FULLOUTERJOIN:dim.user.userid = fact.orderpayment.userid")
    assertLines(p.getColLines, Set(
      ("aaa", "fact.orderpayment.datekey",
        conds + "COLFUN:concat(fact.orderpayment.datekey,1,2)"),
      ("bbbaaa",
        "detail.usersequence_client.clienttype,detail.usersequence_client.clienttype,fact.orderpayment.datekey",
        conds + "COLFUN:case when fact.orderpayment.userid > 5 then detail.usersequence_client.clienttype when fact.orderpayment.userid > 1 then fact.orderpayment.datekey + 5 else 1 - detail.usersequence_client.clienttype end"),
      ("buyer_count", "fact.orderpayment.userid",
        conds + "COLFUN:count(distinct (hash(fact.orderpayment.userid)))")))
  }
}

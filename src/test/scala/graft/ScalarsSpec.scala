package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalars._

/** Pins the edge semantics of every reference scalar (SURVEY §2.8),
  * especially the divergences VERDICT r1 flagged. */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("trueOrFalse: 1→true, 0/other/null→false (utils.py:149-157)") {
    val out = Seq(Some(1), Some(0), Some(7), None).toDF("x")
      .select(trueOrFalse($"x")).as[Boolean].collect()
    assert(out.toSeq == Seq(true, false, false, false))
  }

  test("accountStatus: 1→INACTIVE, 0→ACTIVE, other→null (documented)") {
    val out = Seq(1, 0, 9).toDF("x")
      .select(accountStatus($"x")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("INACTIVE"), Some("ACTIVE"), None))
  }

  test("dollarsToCents truncates like python int(d*100): 19.99→1998") {
    val out = Seq(19.99, 1.01, 0.07, -19.99, 100.0).toDF("d")
      .select(dollarsToCents($"d")).as[Long].collect()
    // python: int(19.99*100)=1998 (1998.99..), int(1.01*100)=101
    // (101.000..01), int(0.07*100)=7, int(-19.99*100)=-1998 (toward zero)
    assert(out.toSeq == Seq(1998L, 101L, 7L, -1998L, 10000L))
  }

  test("mapCategory: full CAT_MAP + cannabis fall-through (menu_items.py:277-304)") {
    val rows = Seq(
      ("Cannabis", 90, 10),  // both>0, sativa>80 → Sativa
      ("Cannabis", 10, 90),  // both>0, indica>80 → Indica
      ("Cannabis", 50, 50),  // both>0, neither>80 → Other (NOT null/Hybrid)
      ("Cannabis", 0, 50),   // not both>0 → Hybrid
      ("Paraphernalia", 0, 0), // → Gear
      ("Tincture", 0, 0),    // → Tinctures
      ("Prerolled", 0, 0),   // → Preroll
      ("Seeds", 0, 0),       // plural → Seed
      ("Drinks", 0, 0),      // plural → Drink
      ("Edibles", 0, 0),     // plural → Edible
      ("Wax", 0, 0),         // in CAT_MAP → passes through
      ("Clone", 0, 0),       // in CAT_MAP → passes through
      ("Flower", 0, 0),      // NOT in CAT_MAP → Other
      ("Garbage", 0, 0))     // → Other
    val out = rows.toDF("c", "s", "i")
      .select(mapCategory($"c", $"s", $"i")).as[String].collect()
    assert(out.toSeq == Seq("Sativa", "Indica", "Other", "Hybrid", "Gear",
      "Tinctures", "Preroll", "Seed", "Drink", "Edible", "Wax", "Clone",
      "Other", "Other"))
  }

  test("setName: both null → login, one null → skip (employees.py:116-124)") {
    val out = Seq((None: Option[String], None: Option[String], "jdoe"),
      (Some("Ann"), None: Option[String], "x"),
      (Some("Ann"), Some("Lee"), "x"))
      .toDF("f", "l", "login")
      .select(setName($"f", $"l", $"login")).as[String].collect()
    assert(out.toSeq == Seq("jdoe", "Ann", "Ann Lee"))
  }

  test("stripFalsy removes null/''/0/0.0/false keys (petl falsy rule)") {
    val df = Seq(1).toDF("x").select(
      stripFalsy(map(
        lit("a"), lit("keep"), lit("b"), lit(""), lit("c"), lit("0"),
        lit("d"), lit("0.0"), lit("e"), lit("false"),
        lit("f"), lit(null).cast("string"))).as("m"))
    val kept = df.select(map_keys($"m")).as[Seq[String]].collect().head
    assert(kept == Seq("a"))
  }

  test("stripDoctorTitle strips Dr/Dr./Drs prefixes (physicians.py:93-96)") {
    val out = Seq("Dr. Alice", "Dr Bob", "Drs Carol", "dr. dave", "Eve")
      .toDF("n").select(stripDoctorTitle($"n")).as[String].collect()
    assert(out.toSeq == Seq("Alice", "Bob", "Carol", "dave", "Eve"))
  }

  test("netMarijuana gates on uom==2 and truncates (menu_items.py:142-144)") {
    val out = Seq((2, 12.9), (1, 12.9)).toDF("u", "m")
      .select(netMarijuana($"u", $"m")).as[Option[Int]].collect()
    assert(out.toSeq == Seq(Some(12), None))
  }

  test("imageUrl null-propagates on missing file (menu_items.py:117-128)") {
    val out = Seq((1L, Some("a.jpg")), (2L, None))
      .toDF("id", "f")
      .select(imageUrl("bkt", $"id", "large", $"f")).as[Option[String]]
      .collect()
    assert(out.toSeq == Seq(Some("bkt/1/large/a.jpg"), None))
  }

  test("phoneArray wraps number or nulls whole array (vendors.py:82-89)") {
    val df = Seq(Some("555"), None).toDF("p")
      .select(phoneArray("business", $"p").as("arr"))
    val out = df.select(element_at($"arr", 1).getField("number"))
      .as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("555"), None))
  }
}

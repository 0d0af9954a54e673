package graft

import graft.etl.{CleanOps, DictColumn, DictionaryOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit suites for the P-operators, fixtures per FIXTURES.md §2-§4
  * (reference semantics from /root/reference/src/transformation_layer.py).
  */
class CleanOpsSpec extends SparkSpec {
  import spark.implicits._

  test("P1 drops columns whose name contains the marker") {
    val df = Seq((1, "a", "b")).toDF("id", "x_duplicated_0", "keep")
    assert(CleanOps.dropColsMatching(df, "duplicated").columns.toSeq == Seq("id", "keep"))
  }

  test("P2 percent strings: strip, trim, null on garbage, divide by 1e7") {
    val df = Seq("950847 %", " 9.5% ", "abc", "").toDF("raw")
    val got = df.select(CleanOps.percentToRate($"raw")).as[Option[Double]].collect()
    assert(got(0).contains(950847.0 / 1e7))
    assert(got(1).contains(9.5 / 1e7))
    assert(got(2).isEmpty && got(3).isEmpty)
  }

  test("P3 multi-format dates: -, ., time suffix, garbage→null") {
    val df = Seq("11/01/2023", "11-01-2023", "11.01.2023", "11/01/2023 08:30", "garbage")
      .toDF("raw")
    val got = df.select(CleanOps.normalizeDate($"raw").cast("string")).as[Option[String]].collect()
    assert(got.take(4).forall(_.contains("2023-01-11")))
    assert(got(4).isEmpty)
  }

  test("P4/P6: date diffs and when-without-otherwise null") {
    val df = Seq(
      (Some("2023-02-20"), "2023-01-10"), // has giro → espera null
      (None, "2023-01-10")                // no giro → espera = days to today
    ).toDF("giro_s", "sol_s")
      .select(to_date($"giro_s").as("giro"), to_date($"sol_s").as("sol"))
    val today = lit(java.sql.Date.valueOf("2023-01-20"))
    val got = df.select(
      CleanOps.daysBetween($"giro", $"sol").as("d"),
      CleanOps.waitingTime($"giro", $"sol", today).as("w"))
      .collect()
    assert(got(0).getLong(0) == 41L && got(0).isNullAt(1))
    assert(got(1).isNullAt(0) && got(1).getLong(1) == 10L)
  }

  test("P7 comma decimals") {
    val got = Seq("1234,56", "20648000", "x").toDF("m")
      .select(CleanOps.commaDecimal($"m")).as[Option[Double]].collect()
    assert(got(0).contains(1234.56) && got(1).contains(2.0648e7) && got(2).isEmpty)
  }

  test("P8/P20 temporal formatting and stringify") {
    val df = Seq(("2023-01-11", "2023-01-11 08:30:15")).toDF("d", "t")
      .select(to_date($"d").as("d"), to_timestamp($"t").as("t"), lit(5L).as("n"))
    val f = CleanOps.formatTemporals(df).collect()(0)
    assert(f.getString(0) == "2023-01-11" && f.getString(1) == "2023-01-11 08:30:15")
    val s = CleanOps.castAllToString(df)
    assert(s.schema.fields.forall(_.dataType == StringType))
    assert(s.collect()(0).getString(2) == "5")
  }

  test("P9 NaN → null only on float columns") {
    val df = Seq((Double.NaN, 1.0), (2.0, Double.NaN)).toDF("a", "b")
    val got = CleanOps.nanToNull(df).collect()
    assert(got(0).isNullAt(0) && got(0).getDouble(1) == 1.0)
    assert(got(1).getDouble(0) == 2.0 && got(1).isNullAt(1))
  }

  test("P10 minute datetime parse, null on garbage") {
    val got = Seq("15/03/2024 14:30", "junk").toDF("r")
      .select(CleanOps.parseDatetimeMinutes($"r").cast("string")).as[Option[String]].collect()
    assert(got(0).contains("2024-03-15 14:30:00"))
    assert(got(1).isEmpty)
  }

  test("P11 designation split: plain, hyphen-rich keeps remainder, no-hyphen constant") {
    val df = Seq("PROFESIONAL-GGC-JUAN PEREZ", "ASESOR-GTICS-ANA-MARIA RUIZ", "MARIA LOPEZ")
      .toDF("destino")
    val got = CleanOps.splitDesignation(df, "destino").collect()
    assert(got(0).getString(1) == "PROFESIONAL" && got(0).getString(2) == "GGC"
      && got(0).getString(3) == "JUAN PEREZ")
    // limit-3 split: the hyphen inside the person name survives
    assert(got(1).getString(3) == "ANA-MARIA RUIZ")
    assert(got(2).isNullAt(1) && got(2).getString(2) == "GAUEGI" && got(2).isNullAt(3))
  }

  test("P12 code lookup: mapped and unmapped→null via broadcast left join") {
    val df = Seq("GGC", "ZZZ").toDF("cod")
    val codes = Seq(("GGC", "Gestion del Credito")).toDF("code", "name")
    val got = CleanOps.codeLookup(df, "cod", codes, "code", "name", "grupo")
      .orderBy($"cod").collect()
    assert(got(0).getString(1) == "Gestion del Credito")
    assert(got(1).isNullAt(1))
  }

  test("P14 empty string → null, only string cols") {
    val df = Seq(("", 0L), ("x", 1L)).toDF("s", "n")
    val got = CleanOps.emptyToNull(df).orderBy($"n").collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) == "x")
  }

  test("P15 dictionary cast: types, Bool→String quirk, skip unknown col") {
    val df = Seq(("1", "11/01/2023", "9.5", true)).toDF("id", "f", "m", "b")
    val dict = Seq(
      DictColumn("id", "Integer", "PK"), DictColumn("f", "Timestamp"),
      DictColumn("m", "Float"), DictColumn("b", "Bool"),
      DictColumn("ghost", "String"))
    val got = DictionaryOps.castByDictionary(df, dict)
    assert(got.schema("id").dataType == LongType)
    assert(got.schema("f").dataType == TimestampNTZType)
    assert(got.schema("m").dataType == DoubleType)
    assert(got.schema("b").dataType == StringType)
    val r = got.collect()(0)
    assert(r.getLong(0) == 1L && r.getString(3) == "true")
    assert(DictionaryOps.primaryKey(dict) == "id")
  }

  test("full reference dictionaries: PKs, audit sets, duplicate logical names") {
    import graft.etl.Dictionaries
    assert(DictionaryOps.primaryKey(Dictionaries.creditos) == "Crédito")
    assert(DictionaryOps.primaryKey(Dictionaries.radicados) == "Radicado")
    assert(DictionaryOps.auditColumns(Dictionaries.radicados) == Seq("Procedencia"))
    val auditCreditos = DictionaryOps.auditColumns(Dictionaries.creditos)
    assert(auditCreditos.contains("FechaGiro") && auditCreditos.contains("TasaInterés")
      && auditCreditos.size == 9)
    // the duplicated logical names that force physical header renaming
    assert(Dictionaries.creditos.count(_.name == "FormaPago") == 2)
    assert(Dictionaries.creditos.count(_.name == "Periodicidad") == 2)
    assert(Dictionaries.creditos.size == 47 && Dictionaries.radicados.size == 14)
    // the whole creditos dictionary drives a cast pass without error
    val df = Seq(("C1", "9.5", "11/01/2023", "true", "5"))
      .toDF("Crédito", "Monto", "FechaGiro", "Tipo70 / 30", "Plazo")
    val cast = DictionaryOps.castByDictionary(df, Dictionaries.creditos)
    assert(cast.schema("Monto").dataType == DoubleType)
    assert(cast.schema("FechaGiro").dataType == TimestampNTZType)
    assert(cast.schema("Tipo70 / 30").dataType == StringType) // Bool→String quirk
    assert(cast.schema("Plazo").dataType == LongType)
  }
}

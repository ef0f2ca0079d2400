package graft

import org.apache.spark.sql.functions._
import graft.etl.Pipeline
import graft.reports.Reports

/** Unit coverage for the smaller pipeline transforms (F3/P6/P11/F25/F26)
  * that the end-to-end fixture doesn't exercise. */
class PipelineUnitSpec extends SparkSpec {
  import spark.implicits._

  test("F3 null-sentinel substitution: null → CPF_NULO, else string value") {
    val df = Seq(Some(12345678901L), None).toDF("CPF")
    val out = Pipeline.nullSentinel(df, "CPF", "CPF_NULO")
      .as[String].collect().toSeq
    assert(out === Seq("12345678901", "CPF_NULO"))
  }

  test("P11 dropIncomplete keeps only rows with all required columns set") {
    val df = Seq(
      (Some("a"), Some("x")), (None, Some("y")), (Some("c"), None))
      .toDF("Data_Marcacao", "Agendamento Inicio")
    assert(Pipeline.dropIncomplete(df,
      Seq("Data_Marcacao", "Agendamento Inicio")).count() === 1)
    // absent required columns are tolerated like the reference's guards
    assert(Pipeline.dropIncomplete(df,
      Seq("Data_Marcacao", "Coluna_Inexistente")).count() === 2)
  }

  test("P6 exportProjection selects present columns in order") {
    val df = Seq((1, "a", true)).toDF("x", "y", "z")
    assert(Pipeline.exportProjection(df, Seq("z", "x", "nope")).columns.toSeq
      === Seq("z", "x"))
  }

  test("F25 decode maps recode known codes and pass through the rest") {
    val df = Seq("A", "E", "?").toDF("Status_Marcacao")
    val out = Pipeline.decodeStatus(df, "Status_Marcacao",
      Pipeline.StatusMarcacaoDecode).as[String].collect().toSeq
    assert(out === Seq("Aberta", "Executada", "?"))
    // absent column is a no-op
    assert(Pipeline.decodeStatus(df, "Outra", Pipeline.StatusConfirmacaoDecode)
      .columns.toSeq === Seq("Status_Marcacao"))
  }

  test("F26 formatted summary renders BR money and rates") {
    val s = Reports.formatSummary(200, 30, 12345.6, 98765.4)
    assert(s.contains("Agendamentos: 200"))
    assert(s.contains("No-shows: 30 (15.00%)"))
    assert(s.contains("R$ 12.345,60"))
    assert(s.contains("R$ 98.765,40"))
  }
}

package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.Pipeline
import graft.io.{Readers, Writers}
import graft.reports.Reports

/** End-to-end run of the appointment pipeline over a reference-shaped
  * fixture (FIXTURES.md §A): ISO-8859-1 `;`-CSV base with day-first
  * timestamps → canonicalize → parse → enrich(asOf) → price join →
  * reports, with hand-computed expectations. Covers every consolidated
  * status including the NO-SHOW-outranks-CANCELADO precedence quirk
  * (/root/reference/src/etl_pipeline.py:265-275). */
class EtlPipelineSpec extends SparkSpec {

  private def write(dir: Path, name: String, text: String, cs: String): String = {
    val p = dir.resolve(name)
    Files.write(p, text.getBytes(Charset.forName(cs)))
    p.toString
  }

  // asOf anchor: 2024-06-01 00:00 — rows before are "past"
  private val asOf = to_timestamp(lit("2024-06-01 00:00:00"))

  private lazy val enriched: DataFrame = {
    val dir = Files.createTempDirectory("etl_e2e")
    val header = Seq(
      "Unidade", "Procedimento", "Nome_Medico", "Convenio",
      "Agendamento Inicio", "Data_Marcacao", "Pacientes_Sexo",
      "Pacientes_DataNascimento", "Pacientes_Indicacao",
      "Pacientes_DataRegistro", "Confirmacoes_Data_Confirmacao",
      "Atendimentos_DataEHora_Chegada", "Atendimentos_DataEHora_Atendimento",
      "Atendimentos_DataEHora_Final", "Cancelamentos_DataDeCancelamento",
      "Categoria_Servico").mkString(";")
    val rows = Seq(
      // R1 ATENDIDO, MANHA, novo, pontual (5 min), F/18-39
      "U1;Consulta Básica;Dr A;Unimed;15/05/2024 07:00;01/05/2024 10:00;F;01/01/2000;Google;01/05/2024 09:00;14/05/2024 09:00;15/05/2024 06:50;15/05/2024 07:05;15/05/2024 07:30;;Rotina",
      // R2 ATENDIDO, TARDE, atraso 20 min, M/13-17
      "U1;Consulta Básica;Dr A;Unimed;15/05/2024 14:00;02/05/2024 10:00;M;01/01/2010;Amigos;01/01/2020 08:00;;15/05/2024 13:55;15/05/2024 14:20;15/05/2024 15:00;;Rotina",
      // R3 NO-SHOW confirmado, MANHA, unmatched price (Exame Raro/Amil)
      "U1;Exame Raro;Dr B;Amil;20/05/2024 07:30;10/05/2024 10:00;F;;Google;;19/05/2024 10:00;;;;;Rotina",
      // R4 the QUIRK: cancelled AFTER the (past) start, never arrived → NO-SHOW
      "U2;Consulta Básica;Dr B;Unimed;21/05/2024 20:00;01/05/2024 08:00;M;01/01/1950;;;;;;;25/05/2024 10:00;Rotina",
      // R5 CANCELAMENTO_TARDIO: future start, cancelled 11 h before it
      "U2;Consulta Básica;Dr A;Bradesco;10/06/2024 07:00;05/05/2024 09:00;M;;;;;;;;09/06/2024 20:00;Rotina",
      // R6 CANCELADO: future start, cancelled weeks ahead
      "U2;Consulta Básica;Dr A;Unimed;15/06/2024 14:00;01/05/2024 10:00;F;;;;;;;;10/05/2024 09:00;Rotina",
      // R7 AGENDADO: future, untouched
      "U1;Consulta Básica;Dr B;Unimed;20/06/2024 07:00;20/05/2024 10:00;M;;;;;;;;;Rotina",
      // R8 NO-SHOW, NOITE, null sexo/nascimento
      "U1;Consulta Básica;Dr A;Unimed;15/05/2024 20:30;02/05/2024 11:00;;;;;;;;;;Rotina")
    val basePath = write(dir, "base.csv", (header +: rows).mkString("\n"), "ISO-8859-1")
    val pricePath = write(dir, "precos.txt",
      "Procedimento\tConvenio\tValor_Convenio\n" +
        "Consulta básica\tUNIMED\tR$ 100,00\n" +
        "Consulta Básica\tBradesco\t80,00\n" +
        "Outro\tAmil\t50,00\n", "ISO-8859-1")

    val base = Readers.csvWithEncodingRetry(spark, basePath, sep = ";")
    val prices = Readers.csvPriceTable(spark, pricePath)
    val parsed = Pipeline.parseDates(Pipeline.canonicalize(base))
    Pipeline.priceJoin(Pipeline.enrich(parsed, asOf), prices)
      .persist()
  }

  private def statusCounts: Map[String, Long] =
    enriched.groupBy("Status_Consolidado").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("status consolidation incl. the NO-SHOW > CANCELADO quirk") {
    assert(statusCounts === Map(
      "ATENDIDO" -> 2L, "NO-SHOW" -> 3L, "CANCELAMENTO_TARDIO" -> 1L,
      "CANCELADO" -> 1L, "AGENDADO" -> 1L))
    // the quirk row specifically: cancelled but classified NO-SHOW
    val quirk = enriched.filter(col("Unidade") === "U2" &&
      col("Cancelamentos_DataDeCancelamento").isNotNull &&
      col("Status_Consolidado") === "NO-SHOW")
    assert(quirk.count() === 1)
  }

  test("price join: normalized accent/case-insensitive keys, miss → 0.0") {
    val vals = enriched.select("Procedimento", "Valor").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(vals.count { case (p, v) => p == "Consulta Básica" && v == 100.0 } === 6)
    assert(vals.contains(("Exame Raro", 0.0))) // unmatched pair
    assert(vals.contains(("Consulta Básica", 80.0))) // Bradesco row
    val unmatched = Pipeline.unmatchedPricePairs(enriched).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(unmatched.toSeq === Seq(("Exame Raro", "Amil")))
  }

  test("A1 daily attendance: 2024-05-15 has 3 appts, 2 attended, 1 no-show") {
    val d = Reports.dailyAttendance(enriched)
      .filter(col("Data_Agendamento") === "2024-05-15").collect()(0)
    assert(d.getLong(1) === 3 && d.getLong(2) === 2 && d.getLong(3) === 1)
    assert(d.getDouble(5) === 66.67 && d.getDouble(6) === 33.33)
  }

  test("A2 status by shift excludes AGENDADO; NOITE is 100% no-show") {
    val byShift = Reports.statusByShift(enriched).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(5))).toMap
    assert(byShift("MANHA")._1 === 3)
    assert(byShift("TARDE")._1 === 2)
    assert(byShift("NOITE") === ((2L, 100.0)))
  }

  test("A4 financials: U1 Consulta Básica revenue splits") {
    val f = Reports.financials(enriched)
      .filter(col("Unidade") === "U1" && col("Procedimento") === "Consulta Básica")
      .collect()(0)
    assert(f.getLong(2) === 4) // total (R1 R2 R7 R8)
    assert(f.getLong(3) === 2) // attended
    assert(f.getDouble(5) === 200.0) // realized revenue
    assert(f.getDouble(6) === 100.0) // lost to no-show (R8)
    assert(f.getDouble(8) === 400.0) // potential
    assert(f.getDouble(9) === 100.0) // ticket médio
  }

  test("A5 journey times for U1/Dr A: waits, punctuality") {
    val j = Reports.journeyTimes(enriched)
      .filter(col("Unidade") === "U1" && col("ID_Medico_Anon") === "Dr A")
      .collect()(0)
    assert(j.getLong(2) === 2) // attended with full journey
    assert(j.getDouble(3) === 52.5) // mean total minutes (40+65)/2
    assert(j.getDouble(4) === 20.0) // mean wait (15+25)/2
    assert(j.getDouble(5) === 12.5) // mean lateness (5+20)/2
    assert(j.getLong(6) === 1 && j.getDouble(7) === 50.0) // on-time rate
  }

  test("A6 patient flow: 1 novo / 7 recorrentes") {
    val flow = Reports.patientFlow(enriched).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(flow("Novo") === ((1L, 12.5)) && flow("Recorrente") === ((7L, 87.5)))
  }

  test("A7 confirmation KPIs: confirmed no-shows isolated") {
    val k = Reports.confirmationKpis(enriched).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(k === Map(
      "TOTAL_AGENDAMENTOS" -> 8L, "CONFIRMADOS" -> 2L, "ATENDIDOS" -> 2L,
      "NO_SHOWS" -> 3L, "NO_SHOWS_CONFIRMADOS" -> 1L, "CANCELADOS" -> 2L))
  }

  test("A9 agenda profile + occupancy join pre-aggregates duplicate side rows") {
    val dir = Files.createTempDirectory("etl_occ")
    val occPath = write(dir, "occ.csv",
      "Nome_Medico;qtde_horarios_disponiveis\nDR A;10\ndr a;5\nDr B;4\n", "UTF-8")
    val occ = Readers.optionalCsv(spark, occPath, ";",
      Seq("Nome_Medico", "qtde_horarios_disponiveis")).get
    val withOcc = Pipeline.occupancyJoin(enriched, occ)
    val a9 = Reports.agendaProfile(withOcc)
      .filter(col("Unidade") === "U1" && col("ID_Medico_Anon") === "Dr A")
      .collect()(0)
    assert(a9.getLong(4) === 3) // R1 R2 R8
    assert(a9.getLong(8) === 15) // 10 + 5 summed before the join
    assert(a9.getDouble(10) === 20.0) // 3 / 15
  }

  test("A10 crosstab by sexo: margins and zero-fill") {
    val ct = Reports.crosstab(enriched, "Pacientes_Sexo").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // F: R1 realizado, R3 no-show, R6 cancelado; M: R2 realizado, R4 no-show,
    // R5 cancelado, R7 AGENDADO→Outro (not pivoted)
    assert(ct("F") === ((1L, 1L, 1L, 3L)))
    assert(ct("M") === ((1L, 1L, 1L, 3L)))
  }

  test("BR-locale CSV sink renders decimal commas for every report") {
    val dir = Files.createTempDirectory("etl_sink")
    Writers.csvBr(Reports.dailyAttendance(enriched), dir.toString + "/a1",
      singleFile = true)
    val file = Files.list(java.nio.file.Paths.get(dir.toString + "/a1"))
      .iterator().asInstanceOf[java.util.Iterator[Path]]
    val csv = scala.jdk.CollectionConverters.IteratorHasAsScala(file).asScala
      .find(_.getFileName.toString.endsWith(".csv")).get
    val text = new String(Files.readAllBytes(csv), "UTF-8")
    assert(text.contains("66,67") && text.contains("33,33"))
    assert(!text.split("\n").drop(1).exists(_.matches(".*\\d\\.\\d.*")))
  }
}

package graft.sources.sensical

import java.nio.file.{Files, Paths}

/** Deterministic Sensical crack-report fixture (shape mirrors
  * file_analysis.py:7-86's expectations): title, Zeit line, quantile
  * row with decimal commas, crack count, data block with a junk line,
  * a blank line, an extra-token row, and trailing garbage after End —
  * all the parse edges in one file. */
object SensicalFixtures {

  val ReportText: String =
    """Bauwerk R6-07 - Sensor Nord
      |Messbericht Sensical v2
      |Zeit   22-Apr-2025 12:26:43
      |
      |q50 q90 max wCr
      |0,12 0,45 1,08
      |
      |Anzahl erkannter Risse: 6
      |
      |Rissposition (m) vs. Rissbreite (mm)
      |X Y Z wCr
      |1,0 2,0 0,1 0,10
      |2,5 2,0 0,1 0,20
      |-- Kalibrierung ok --
      |4,0 2,1 0,2 0,35
      |
      |5,5 2,1 0,2 0,45
      |7,0 2,2 0,3 0,80 99
      |8,5 2,2 0,3 1,08
      |End
      |5,5 9,9 9,9 9,99
      |""".stripMargin

  /** Expected cracks after the F6 gate (junk/blank dropped, first 4
    * numeric tokens kept, nothing after End). */
  val ExpectedCracks: Seq[(Double, Double, Double, Double)] = Seq(
    (1.0, 2.0, 0.1, 0.10),
    (2.5, 2.0, 0.1, 0.20),
    (4.0, 2.1, 0.2, 0.35),
    (5.5, 2.1, 0.2, 0.45),
    (7.0, 2.2, 0.3, 0.80),
    (8.5, 2.2, 0.3, 1.08))

  /** Write the fixture report if absent; returns the directory. */
  def ensure(dir: String = "/tmp/graft_sensical"): String = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val p = d.resolve("report1.txt")
    if (!Files.exists(p)) Files.writeString(p, ReportText)
    d.toAbsolutePath.toString
  }
}

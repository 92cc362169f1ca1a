package graft

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {

  test("config precedence: cli > env > props > default") {
    val conf = Main.resolveConfig(
      Seq("--inputdir=cli_in"),
      Map("GRAFT_INPUTDIR" -> "env_in", "GRAFT_DATECOLUMN" -> "env_dc"),
      Map("inputdir" -> "file_in", "datecolumn" -> "file_dc",
        "jdbcurl" -> "file_url"))
    assert(conf("inputdir") == "cli_in")      // cli beats env+file
    assert(conf("datecolumn") == "env_dc")    // env beats file
    assert(conf("jdbcurl") == "file_url")     // file beats default
    assert(conf("processeddir") == "processed") // default
  }

  test("unknown options are rejected, --config is allowed") {
    assertThrows[IllegalArgumentException] {
      Main.resolveConfig(Seq("--nope=1"), Map.empty, Map.empty)
    }
    val conf = Main.resolveConfig(Seq("--config=/tmp/x.properties"),
      Map.empty, Map.empty)
    assert(conf("inputdir") == "input")
  }

  test("loadProps strips the reference INI dialect's quoted values " +
      "(datapump.ini works verbatim)") {
    val f = java.nio.file.Files.createTempFile("graft-ini", ".ini")
    java.nio.file.Files.writeString(f,
      """inputdir="./input"
        |processeddir="./processed"
        |datecolumn="DateTime"
        |dateformats="%y-%m-%d %H:%M:%S, %y/%m/%d %H:%M:%S"
        |apikey='123456789'
        |verbose=True
        |""".stripMargin)
    val props = Main.loadProps(f.toString)
    assert(props("inputdir") == "./input")       // double quotes stripped
    assert(props("apikey") == "123456789")       // single quotes stripped
    assert(props("verbose") == "True")           // bare value untouched
    assert(props("dateformats").startsWith("%y-")) // inner content intact
    val conf = Main.resolveConfig(Nil, Map.empty, props)
    assert(conf("inputdir") == "./input")
    java.nio.file.Files.delete(f)
  }

  test("dateformats round-trips through the |-separated encoding") {
    val conf = Main.resolveConfig(Nil, Map.empty, Map.empty)
    assert(conf("dateformats").split('|').toSeq ==
      graft.ingest.CsvIngest.DefaultFormats)
  }
}

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

  test("dateformats round-trips through the |-separated encoding") {
    val conf = Main.resolveConfig(Nil, Map.empty, Map.empty)
    assert(conf("dateformats").split('|').toSeq ==
      graft.ingest.CsvIngest.DefaultFormats)
  }
}

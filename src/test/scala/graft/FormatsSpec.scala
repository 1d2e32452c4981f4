package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Formats, Tables}

class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    s"$d/out"
  }

  test("csv round-trip preserves documents") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("csv")
    Formats.writeCsv(docs, path)
    val back = Formats.readCsv(spark, path, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("json round-trip preserves orders") {
    val orders = Tables.orders(spark, sf)
    val path = tmp("json")
    Formats.writeJson(orders, path)
    val back = Formats.readJson(spark, path, orders.schema)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("text round-trip preserves lines") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("text")
    Formats.writeText(docs, "text", path)
    val back = Formats.readText(spark, path)
    assert(back.count() == docs.count())
  }
}

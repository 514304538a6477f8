package graft

import graft.facade.Cat
import graft.storage.ParquetStorage

class CatSpec extends SparkSpec {

  test("produce JSON-lines file -> log -> consume back as JSON (S10/S11)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val storage = new ParquetStorage(spark, root)
    storage.createTopic("cat", 2)
    val src = java.nio.file.Files.createTempDirectory("graft-cat-src")
      .resolve("docs.jsonl")
    java.nio.file.Files.writeString(src,
      (0 until 10).map(i => s"""{"key":"k$i","amount":$i}""").mkString("\n"))

    val results = Cat.produce(spark, storage, "cat", 2, src.toString)
    assert(results.forall(_._2.isRight))

    val lines = Cat.consumeJson(storage, "cat", 2)
    assert(lines.size === 10)
    // the value column is a JSON string, escaped inside the envelope
    assert(lines.forall(_.contains("\\\"amount\\\"")))
    // round-trip: every original key present exactly once
    val keys = lines.flatMap("\"k(\\d+)\"".r.findFirstMatchIn(_)).map(_.group(1))
    assert(keys.sorted.map(_.toInt).sorted === (0 until 10))
  }
}

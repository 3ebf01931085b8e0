package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("fileTriples joins json/html/pdf payloads by path stem") {
    val dir = Files.createTempDirectory("landing")
    def put(name: String, content: String) =
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    put("doc_a.json", """{"id": "a"}""")
    put("doc_a.html", "<html><body>Hello A</body></html>")
    put("doc_a.pdf", "%PDF-fake-a")
    put("doc_b.json", """{"id": "b"}""")
    put("doc_b.html", "<html><body>Only html</body></html>")
    // no pdf for b

    val triples = Ingest.fileTriples(spark, dir.toString).collect()
      .map(r => r.getString(0) -> (r.get(1) != null, r.get(2) != null, r.get(3) != null))
      .toMap
    assert(triples == Map(
      "doc_a" -> (true, true, true),
      "doc_b" -> (true, true, false)))
  }

  test("referenceList parses line-oriented side inputs") {
    val f = Files.createTempFile("refs", ".txt")
    Files.write(f, "BGE_123 target_1\n\nBGE_456 target_2\n".getBytes)
    val rows = Ingest.referenceList(spark, f.toString).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("BGE_123", "target_1"), ("BGE_456", "target_2")))
  }
}

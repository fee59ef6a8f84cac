package graft

import graft.operators.Anagrams

/** End-to-end semantics of the anagram pipeline on a fixture corpus —
  * the Spark port of mapphase/map_test.go:15-70 (mapper) and
  * reducephase/reduce_test.go:16-75 (reducer: dedup, sort, >1 filter,
  * "sig: w1 w2" formatting). */
class AnagramPipelineSpec extends SparkTestBase {

  // doc 1 repeats words (per-doc dedup), doc 2 overlaps doc 1 (global dedup);
  // "the"/"a" are stopwords; "dog." trims to "dog"; "test1string" is dropped.
  private lazy val dir = writeDocsFixture(Seq(
    1L -> "the care race RACE part dog. test1string",
    2L -> "race trap part a care",
  ))

  test("anagrams: groups with >1 distinct word, sorted, space-joined") {
    val rows = collectSet(Anagrams.anagrams(spark, dir))
    assert(rows == Set(
      Seq("acer", "care race"),
      Seq("aprt", "part trap"),
    ))
  }

  test("anagram_groups keeps singletons too") {
    val rows = Anagrams.anagramGroups(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("acer") == "care race")
    assert(rows("dgo") == "dog")
    assert(!rows.contains("eht")) // stopword filtered
  }

  test("anagram_output_lines formats like reducephase/reduce.go:36-52") {
    val lines = Anagrams.anagramOutputLines(spark, dir).collect().map(_.getString(0)).toSet
    assert(lines.contains("acer: care race"))
    assert(lines.contains("aprt: part trap"))
  }

  test("doc_unique_words dedups per document case-insensitively") {
    val rows = Anagrams.docUniqueWords(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // raw tokens of doc 1, lowercased + deduped + sorted
    assert(rows(1L) == "care dog. part race test1string the")
  }

  test("preprocess_words filters stopwords and non-letter words") {
    val words = Anagrams.preprocessWords(spark, dir).collect().map(_.getString(0)).toSet
    assert(words == Set("care", "race", "part", "dog", "trap"))
  }

  test("tokenize splits on whitespace and drops empties") {
    val n = Anagrams.tokenize(spark, dir).count()
    assert(n == 7 + 5)
  }
}

package graft

/** The native expressions are SQL-callable after registration (via
  * GraftExtensions for new sessions, installInto for live ones). */
class ExtensionsSpec extends SparkSpecBase {

  test("native expressions are callable from SQL") {
    GraftExtensions.installInto(spark)
    val dot = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    val jac = spark.sql("SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j")
      .collect()(0).getDouble(0)
    assert(math.abs(jac - 0.5) < 1e-12)
    val nsh = spark.sql("SELECT size(char_shingles('abcdef', 5)) AS n")
      .collect()(0).getInt(0)
    assert(nsh == 2) // 'abcde', 'bcdef'
    val sig = spark.sql("SELECT size(minhash_sig(char_shingles('hello world!', 5))) AS n")
      .collect()(0).getInt(0)
    assert(sig == 64)
    val sh = spark.sql("SELECT simhash64(array('a','b')) AS h").collect()(0).getLong(0)
    val sh2 = spark.sql("SELECT simhash64(array('b','a')) AS h").collect()(0).getLong(0)
    assert(sh == sh2, "simhash is order-independent")
    val rep = spark.sql(
      "SELECT repetition_stats(array('a','b','a','b')).top_2gram_count AS c")
      .collect()(0).getLong(0)
    assert(rep == 2, "'a b' occurs twice")
    val csh = spark.sql("SELECT size(char_shingle_hashes('abcdef', 5)) AS n")
      .collect()(0).getInt(0)
    assert(csh == 2) // hashes of 'abcde', 'bcdef'
  }
}

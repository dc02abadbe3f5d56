package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query executes at sf0.001 with a sane shape; queries
  * whose fixtures guarantee output are additionally rows>0. The value-level
  * gate is the driver's DuckDB oracle (tools/check.py locally).
  */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  // Pair-finding queries can legitimately be empty on a tiny SF; everything
  // else must produce rows at sf0.001.
  private val mayBeEmpty = Set("q31_minhash_lsh", "q32_simhash", "q33_ngram_jaccard",
    "q7_customers_without_orders", "q46_embedding_neardup")

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up — wall-to-wall, no rows-only queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // since round 6 EVERY declared query carries an oracle (q42 was the
    // last rows-only entry; it now validates its sketch against exact
    // counts). A new query without an oracle is a regression.
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"declared queries without an oracle: $unoracled")
  }

  test("no dark modules: every operator object's queries map is registered") {
    // Round-4 regression guard: Corpus.scala shipped a finished queries map
    // that SparkEntry never unioned in, making three operators invisible to
    // the driver. Scan the compiled classpath for every Scala object under
    // the operator packages exposing a `queries: Map[...]` and assert each
    // key is reachable from SparkEntry.queries.
    import java.io.File
    val packages = Seq("graft.operators", "graft.sql")
    val cl = getClass.getClassLoader
    val moduleClasses = packages.flatMap { pkg =>
      val path = pkg.replace('.', '/')
      import scala.jdk.CollectionConverters._
      cl.getResources(path).asScala.toSeq.filter(_.getProtocol == "file").flatMap { url =>
        val dir = new File(url.toURI)
        Option(dir.listFiles()).toSeq.flatten
          .map(_.getName)
          .filter(n => n.endsWith("$.class") && !n.dropRight(7).contains("$"))
          .map(n => pkg + "." + n.stripSuffix(".class"))
      }
    }
    assert(moduleClasses.nonEmpty, "classpath scan found no operator objects — scan broken")
    val declared = SparkEntry.queries.keySet
    val dark = moduleClasses.flatMap { cn =>
      val clazz = Class.forName(cn, false, cl)
      val hasQueries = clazz.getMethods.exists(m =>
        m.getName == "queries" && m.getParameterCount == 0 &&
          classOf[Map[_, _]].isAssignableFrom(m.getReturnType))
      if (!hasQueries) Nil
      else {
        val module = clazz.getField("MODULE$").get(null)
        val keys = clazz.getMethod("queries").invoke(module)
          .asInstanceOf[Map[String, _]].keySet
        val missing = keys -- declared
        if (missing.isEmpty) Nil else Seq(cn -> missing)
      }
    }
    assert(dark.isEmpty,
      s"operator modules with queries not registered in SparkEntry: $dark")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}

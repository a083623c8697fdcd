package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: runs every SparkEntry query with codegen fallback
  * DISABLED so any expression that generates uncompilable Java fails
  * loudly (named per query) instead of silently dropping the whole
  * stage to the interpreted path. Run whenever a
  * `CompileException ... generated.java` shows up in bench stderr.
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val only = args.toSet
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        try {
          fn(spark, sfDir).count()
          println(s"OK   $name")
        } catch {
          case e: Throwable =>
            bad += 1
            val root = {
              var c: Throwable = e
              while (c.getCause != null && c.getCause != c) c = c.getCause
              c
            }
            println(s"FAIL $name :: ${root.getClass.getSimpleName}: " +
              root.getMessage.linesIterator.take(3).mkString(" | "))
        }
      }
    }
    println(s"codegen-audit: $bad failing")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}

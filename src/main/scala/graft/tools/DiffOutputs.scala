package graft.tools

import org.apache.spark.sql.SparkSession

/** Compares two `graft.Verify` output directories (per-query parquet) as
  * row multisets — the optimization round's result-regression gate: every
  * declared query must produce an identical multiset before and after a
  * change. Usage: runMain graft.tools.DiffOutputs <dirA> <dirB>
  */
object DiffOutputs {
  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = new java.io.File(dirA).listFiles().filter(_.isDirectory).map(_.getName).sorted
    var bad = 0
    names.foreach { n =>
      try {
        val a = spark.read.parquet(s"$dirA/$n")
        val b = spark.read.parquet(s"$dirB/$n")
        if (a.schema.toString != b.schema.toString) {
          println(s"[DIFF] $n SCHEMA: ${a.schema.simpleString} vs ${b.schema.simpleString}"); bad += 1
        } else {
          val ra = a.collect().map(_.toString).sorted
          val rb = b.collect().map(_.toString).sorted
          if (!java.util.Arrays.equals(ra.asInstanceOf[Array[AnyRef]], rb.asInstanceOf[Array[AnyRef]])) {
            val onlyA = ra.diff(rb).take(3)
            val onlyB = rb.diff(ra).take(3)
            println(s"[DIFF] $n rows ${ra.length} vs ${rb.length}; onlyA=${onlyA.mkString("|")} onlyB=${onlyB.mkString("|")}")
            bad += 1
          } else println(s"[ok] $n (${ra.length} rows)")
        }
      } catch { case e: Throwable => println(s"[DIFF] $n read failed: ${e.getMessage}"); bad += 1 }
    }
    println(s"DIFFRESULT mismatches=$bad of ${names.length}")
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Side measurement harness for the optimization rounds — NEVER the driver
  * contract (that is `graft.Bench`, frozen). Two modes:
  *
  *   runMain graft.tools.BenchExtra explain <tag> [queryFilter...]
  *     writes `.explain("formatted")` of each query to plans/r06/<name>_<tag>.txt
  *
  *   runMain graft.tools.BenchExtra time <repeats> [queryFilter...]
  *     times each query with the SAME action the frozen bench uses
  *     (`.count()`), plus a noop-sink pass (guide §1.4) that computes every
  *     column, and prints one JSON line of per-query minima over repeats.
  *
  * Environment mirrors Bench: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mode = args.headOption.getOrElse("time")
    val rest = args.drop(1).toSeq
    mode match {
      case "explain" =>
        val tag = rest.headOption.getOrElse("before")
        val filter = rest.drop(1)
        val dir = Paths.get("plans/r06")
        Files.createDirectories(dir)
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          if (filter.isEmpty || filter.exists(name.contains)) {
            try {
              val df = fn(spark, sfDir)
              val plan = df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              Files.writeString(dir.resolve(s"${name}_$tag.txt"), plan)
              println(s"[explain] $name -> plans/r06/${name}_$tag.txt")
            } catch {
              case e: Throwable => println(s"[explain] $name FAILED: ${e.getMessage}")
            }
          }
        }
      case "time" =>
        val repeats = rest.headOption.flatMap(_.toIntOption).getOrElse(1)
        val filter = rest.drop(1)
        var counts = Map.empty[String, Seq[Double]]
        var noops = Map.empty[String, Seq[Double]]
        (0 until repeats).foreach { _ =>
          SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
            if (filter.isEmpty || filter.exists(name.contains)) {
              spark.sparkContext.setJobDescription(s"bench-extra: $name count")
              val t0 = System.nanoTime()
              try fn(spark, sfDir).count() catch { case e: Throwable => println(s"[err] $name: $e") }
              val tc = (System.nanoTime() - t0) / 1e9
              counts = counts.updated(name, counts.getOrElse(name, Nil) :+ tc)
              spark.sparkContext.setJobDescription(s"bench-extra: $name noop")
              val t1 = System.nanoTime()
              try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              catch { case e: Throwable => println(s"[err-noop] $name: $e") }
              val tn = (System.nanoTime() - t1) / 1e9
              noops = noops.updated(name, noops.getOrElse(name, Nil) :+ tn)
              println(f"[time] $name count=$tc%.3f noop=$tn%.3f")
            }
          }
        }
        def mins(m: Map[String, Seq[Double]]): String = m.toSeq.sortBy(-_._2.min)
          .map { case (k, vs) => "\"" + k + f"""\":${vs.min}%.3f""" }.mkString("{", ",", "}")
        println(s"""BENCHEXTRA {"count_min":${mins(counts)},"noop_min":${mins(noops)},"total_count_min":${counts.values.map(_.min).sum},"sf":"$sfDir","cpus":$cpus}""")
    }
    spark.stop()
  }
}

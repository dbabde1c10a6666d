package graft.tools

import graft.{GraftSession, SparkEntry}

// Scratch: run every embedding-reading query over a degenerate embeddings
// table (zero vector, null embedding) to find ANSI/NaN crashes.
object ProbeEdgeVecs {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    val dim = 64
    val dst = graft.TempDirs.create("graft-edgevecs")
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    java.nio.file.Files.list(src).forEach { p =>
      java.nio.file.Files.copy(p, dst.resolve(p.getFileName.toString))
    }
    java.nio.file.Files.delete(dst.resolve("embeddings.parquet"))
    val rows = (0 until 60).map { i =>
      val v: Seq[Float] =
        if (i == 7) Seq.fill(dim)(0.0f) // zero norm
        else if (i == 13) null // null embedding
        else (0 until dim).map(k => ((i * 31 + k * 7) % 17 - 8).toFloat / 8f)
      (i.toLong, v, i % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(dst.resolve("embeddings.parquet").toString)
    val embQs = SparkEntry.queries.keys.toSeq.sorted.filter(n =>
      Seq("q39", "q40", "q41", "q42", "q43", "q44", "q45", "q46", "q67",
        "q69", "q78", "q87", "q99", "q106", "q107").exists(n.startsWith))
    embQs.foreach { name =>
      try {
        val n = SparkEntry.queries(name)(spark, dst.toString).count()
        println(s"OK   $name rows=$n")
      } catch { case e: Throwable =>
        println(s"FAIL $name: ${e.getClass.getSimpleName} " +
          String.valueOf(e.getMessage).replace('\n', ' ').take(160))
      }
    }
    spark.stop()
  }
}

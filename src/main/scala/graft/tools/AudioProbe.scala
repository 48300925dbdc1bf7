package graft.tools

import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** Micro-probe for the q_audio_decode per-row cost (guide §1.2 step 2:
  * per-task work): times each stage of the WAV decode kernel in
  * isolation, outside Spark, over the same arithmetic WAV corpus the
  * fixture builds — so a kernel change can be attributed to the right
  * sub-step before touching Multimodal.scala.
  *
  *   sbt "runMain graft.tools.AudioProbe [nAssets]"
  */
object AudioProbe {
  /** Per-JVM cached AudioFileReader providers (the Multimodal r15 fix,
    * replicated here because the production field is private).
    */
  lazy val cachedReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    val (midi, std) = buf.partition(_.getClass.getName.contains("Midi"))
    (std ++ midi).toArray
  }

  private def wavBytes(id: Long): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val nFrames = (id % 800 + 1).toInt
    val v = (id % 20000 - 10000).toInt
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val corpus = (0 until n).map(i => wavBytes(i.toLong)).toArray
    def time(name: String, reps: Int)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { f; r += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[audio-probe] $name%-32s ${dt / reps}%8.4f s/pass  (${dt / reps / n * 1e6}%8.1f us/row)")
    }
    time("getAudioInputStream only", 3) {
      corpus.foreach { b =>
        val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b))
        ais.close()
      }
    }
    time("getAudioInputStream+readAll", 3) {
      corpus.foreach { b =>
        val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b))
        ais.readAllBytes()
        ais.close()
      }
    }
    time("getAudioFileFormat only", 3) {
      corpus.foreach { b =>
        AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(b))
      }
    }

    // The same work INSIDE Spark executor tasks: phase timings summed
    // per task and printed from the driver — isolates whether the
    // in-executor cost is the provider scan, the reader, the stream
    // drain, or something around them (classloader context differs).
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc1 = spark.sparkContext.longAccumulator("getStream_ns")
    val acc2 = spark.sparkContext.longAccumulator("drain_ns")
    val acc3 = spark.sparkContext.longAccumulator("rows")
    import spark.implicits._
    val ds = spark.sparkContext.parallelize(corpus.toSeq, 8)
    (1 to 3).foreach { r =>
      acc1.reset(); acc2.reset(); acc3.reset()
      val t0 = System.nanoTime()
      ds.foreachPartition { it =>
        it.foreach { b =>
          val ta = System.nanoTime()
          val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b))
          val tb = System.nanoTime()
          ais.readAllBytes(); ais.close()
          val tc = System.nanoTime()
          acc1.add(tb - ta); acc2.add(tc - tb); acc3.add(1)
        }
      }
      println(f"[audio-probe] spark AudioSystem rep $r: wall ${(System.nanoTime() - t0) / 1e9}%.3f s, getStream ${acc1.value / 1e9}%.2f s (${acc1.value / math.max(acc3.value, 1) / 1e3}%.0f us/row), drain ${acc2.value / 1e9}%.2f s (${acc2.value / math.max(acc3.value, 1) / 1e3}%.0f us/row), rows ${acc3.value}")
    }
    // Stack-sample the executor threads mid-run (guide §7.3, thread
    // dumps): whatever frame repeats across samples is the per-row cost
    val sampler = new Thread(() => {
      (1 to 12).foreach { _ =>
        Thread.sleep(60)
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.contains("Executor task launch") && st.nonEmpty) {
            val hot = st.take(6).map(f => s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}").mkString(" <- ")
            println(s"[audio-probe-stack] $hot")
          }
        }
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    // Same loop through a per-JVM cached AudioFileReader list (what
    // Multimodal.readAudioStream does after the r15 fix)
    (1 to 3).foreach { r =>
      acc1.reset(); acc2.reset(); acc3.reset()
      val t0 = System.nanoTime()
      ds.foreachPartition { it =>
        it.foreach { b =>
          val ta = System.nanoTime()
          val readers = AudioProbe.cachedReaders
          var ais: AudioInputStream = null
          var i = 0
          while (ais == null && i < readers.length) {
            try ais = readers(i).getAudioInputStream(new java.io.ByteArrayInputStream(b))
            catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
            i += 1
          }
          val tb = System.nanoTime()
          ais.readAllBytes(); ais.close()
          val tc = System.nanoTime()
          acc1.add(tb - ta); acc2.add(tc - tb); acc3.add(1)
        }
      }
      println(f"[audio-probe] spark cachedSPI rep $r: wall ${(System.nanoTime() - t0) / 1e9}%.3f s, getStream ${acc1.value / 1e9}%.2f s (${acc1.value / math.max(acc3.value, 1) / 1e3}%.0f us/row), drain ${acc2.value / 1e9}%.2f s (${acc2.value / math.max(acc3.value, 1) / 1e3}%.0f us/row), rows ${acc3.value}")
    }
    spark.stop()
  }
}

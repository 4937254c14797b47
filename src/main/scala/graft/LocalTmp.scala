package graft

/** Scratch-space selection for benchmark/verify temp stores: prefer tmpfs
  * (/dev/shm) over the VM's virtio disk. The sandbox's /tmp sits on a
  * virtual disk whose throughput swings 3x across minutes (measured:
  * identical persisted builds 28.8s vs 81.7s); a local-mode benchmark that
  * writes its index there measures host IO jitter, not the engine. A real
  * deployment persists to HDFS/S3 — neither is modeled by a noisy local
  * disk, so tmpfs is the honest local stand-in. Falls back to
  * java.io.tmpdir when /dev/shm is absent. */
object LocalTmp {
  def base: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Temp dir removed recursively at JVM exit: tmpfs is RAM-backed, so
    * leaked index stores from repeated bench runs would accumulate until
    * /dev/shm fills and later builds fail or the host swaps. */
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(base, prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        try java.nio.file.Files.deleteIfExists(p) catch { case _: java.io.IOException => }
      }
      rm(d)
    }))
    d.toString
  }
}

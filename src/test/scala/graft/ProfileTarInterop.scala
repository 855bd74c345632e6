package graft

/** Dev-only interop probe (Test/runMain graft.ProfileTarInterop):
  * writes one WebDataset shard with `TarCodec` to /tmp/graft_tar_interop
  * so system GNU tar / python tarfile can list and extract it — the
  * external conformance evidence behind the hermetic PipelineSpec golden
  * (SURVEY §6.24). No Spark session needed: the codec is pure.
  */
object ProfileTarInterop {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Multimodal, WebDataset}
    val dir = java.nio.file.Paths.get("/tmp/graft_tar_interop")
    java.nio.file.Files.createDirectories(dir)
    val ids = Seq(0L, 3L, 6L, 9L)
    val members = ids.flatMap { id =>
      Seq((s"$id.bmp", Multimodal.BmpCodec.encode(id)),
        (s"$id.json", WebDataset.sidecar(id).getBytes("US-ASCII")))
    }
    val bytes = WebDataset.TarCodec.archive(members)
    java.nio.file.Files.write(dir.resolve("shard-000000.tar"), bytes)
    println(s"[tar-interop] wrote ${bytes.length} bytes, " +
      s"${members.length} members -> $dir/shard-000000.tar")
    // round-trip through our own parser as a smoke check
    val back = WebDataset.TarCodec.parse(bytes)
    assert(back.map(_._1) == members.map(_._1))
    assert(back.zip(members).forall { case ((_, a), (_, b)) =>
      java.util.Arrays.equals(a, b) })
    println("[tar-interop] self-parse round-trip OK")
  }
}

package graft.bench

import graft.Bench

/** Host-quietness gate for the scaling protocol (BENCH.md): samples
  * `/proc/stat` steal over a 10 s window and three pinned memory-bandwidth
  * copies 3 s apart. Quiet = steal below 10 ticks/s AND bandwidth swing
  * below 10% — the thresholds under which round-2/4 scaling pairs
  * reproduced and round-3's contended window (steal ≈164 ticks/s,
  * bandwidth swinging ±34%) would have been rejected.
  *
  * Prints one JSON line; exit code 0 iff quiet, so shell protocols can gate:
  *   taskset -c 31 sbt "runMain graft.bench.QuietProbe" || exit 1
  */
object QuietProbe {
  def main(args: Array[String]): Unit = {
    val s0 = Bench.stealTicks()
    val t0 = System.nanoTime()
    val bw = Array.fill(3)(0.0)
    bw(0) = Bench.membwGbps()
    Thread.sleep(3000)
    bw(1) = Bench.membwGbps()
    Thread.sleep(3000)
    bw(2) = Bench.membwGbps()
    Thread.sleep(4000)
    val s1 = Bench.stealTicks()
    val wall = (System.nanoTime() - t0) / 1e9
    val stealRate = if (s0 < 0 || s1 < 0) -1.0 else (s1 - s0) / wall
    val swing = (bw.max - bw.min) / bw.max
    val quiet = stealRate >= 0 && stealRate < 10.0 && swing < 0.10
    println(f"""{"steal_ticks_per_sec":$stealRate%.1f,""" +
      f""""membw_gbps":[${bw(0)}%.1f,${bw(1)}%.1f,${bw(2)}%.1f],""" +
      f""""swing":$swing%.3f,"quiet":$quiet}""")
    if (!quiet) sys.exit(1)
  }
}

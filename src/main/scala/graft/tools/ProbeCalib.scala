package graft.tools

// Scratch: idle-host reference values for the round-10 parallel
// calibration probe (VERDICT r9 task 1). Measures the single-thread spin
// (t1, a machine constant the r9 forensics showed is nearly contention-
// INSENSITIVE) against an N-thread gang of the same workload timed
// together (tN): effCores = N * t1 / tN is the number of cores actually
// available to an N-way stage. Run idle to pick the contention threshold.
object ProbeCalib {
  def main(args: Array[String]): Unit = {
    val procs = Runtime.getRuntime.availableProcessors()
    println(s"[pc] procs=$procs quota=${graft.Bench.cgroupQuota()} " +
      s"load=${graft.Bench.loadavg1()}")
    graft.Bench.calibSpin(); graft.Bench.calibSpinPar(procs) // JIT warmup
    for (n <- Seq(procs, 8, 4); r <- 1 to 4) {
      val t1 = graft.Bench.calibSpin()
      val tN = graft.Bench.calibSpinPar(n)
      println(f"[pc] n=$n%-2d rep$r t1=$t1%.3f tN=$tN%.3f " +
        f"eff=${n * t1 / tN}%5.1f load=${graft.Bench.loadavg1()}%.1f")
    }
  }
}

/**
 * Exogenous-host-window canary (r12 verdict #4).
 *
 * A trivial fixed-work timer PROCESS: every ~500 ms it runs a constant
 * CPU workload (2^25 xorshift64* steps — pure register arithmetic, no
 * allocation, no syscalls inside the timed region) and appends one
 * line `{"t":<epochMs>,"workMs":<ms>}` to the timeline file. Because
 * the work is constant and single-threaded, `workMs` dilates if and
 * only if the HOST is slow during that interval (CPU contention,
 * frequency scaling, noisy-neighbor windows) — and because this runs
 * in its OWN JVM, the bench JVM's GC pauses cannot touch it. A bench
 * line that is slow while the canary timeline is flat is the TREE's
 * fault; a bench line slow inside a dilated canary window is the
 * host's. Prior rounds answered that question by re-bisecting
 * (SURVEY §8, r12: four text-family lines at 2-3× turned out to be a
 * host window covering all their reps); the timeline makes it an
 * artifact diff instead.
 *
 * Launched by graft.Bench under SPARK_GRAFT_CANARY=1 via JDK
 * source-file mode (`java tools/canary/Canary.java <outfile>`) so it
 * needs no classpath; killed (destroy → SIGTERM) at bench end. Each
 * line is flushed as written, so the timeline survives the kill.
 */
public final class Canary {
    private static final long STEPS = 1L << 25;

    public static void main(String[] args) throws Exception {
        String out = args.length > 0 ? args[0] : "canary.jsonl";
        try (java.io.PrintWriter w = new java.io.PrintWriter(
                new java.io.FileWriter(out, false), true)) {
            long x = 0x9E3779B97F4A7C15L; // fixed seed: identical work every rep
            while (true) {
                long t0 = System.nanoTime();
                for (long i = 0; i < STEPS; i++) {
                    x ^= x >>> 12;
                    x ^= x << 25;
                    x ^= x >>> 27;
                    x *= 0x2545F4914F6CDD1DL;
                }
                long ms = (System.nanoTime() - t0) / 1_000_000L;
                // consume x so the loop cannot be dead-code-eliminated
                if (x == 42) w.println("{}");
                w.println("{\"t\":" + System.currentTimeMillis() + ",\"workMs\":" + ms + "}");
                Thread.sleep(500);
            }
        }
    }
}

package graft

/** Test-only main launched as a SEPARATE JVM by SinkDurabilitySpec's
  * cross-process lock tests — the real two-session scenario the
  * in-process six-writer stress can't reach (distinct [[Streams
  * .writerToken]]s, lock files crossing a true process boundary, a
  * crashed PROCESS leaving its lock behind).
  *
  * Acquires the sink's commit lock through the real commit path (an
  * empty staged re-commit of the current manifest — no Spark needed:
  * the commit layer is pure file metadata) and holds it for `holdMs`
  * inside the lock window. Prints `HELD` once the lock is taken (the
  * parent test synchronizes on it) and `RELEASED` after a clean
  * commit+release. The crash variant is the parent destroying this
  * process while it sleeps — the leftover LOCK then ages out via the
  * lease exactly as a crashed production writer's would. */
object LockContenderMain {
  def main(args: Array[String]): Unit = {
    val sink = args(0)
    val holdMs = args(1).toLong
    val st = Streams.readManifestState(sink)
    Streams.upsertCommit(sink, Streams.Staged(st.commitId, st.entries), tick = q =>
      if (q == "lock-acquired") {
        println("HELD")
        System.out.flush()
        Thread.sleep(holdMs)
      })
    println("RELEASED")
    System.out.flush()
  }
}

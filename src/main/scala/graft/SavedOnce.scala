package graft

/** Memoizes an expensive fit-and-save per key — the steady-state pattern
  * behind the persisted dedup/ANN/LM artifacts (q45/q74/q76/q88/q101,
  * dup-graph tables). `TrieMap.getOrElseUpdate` is NOT atomic: two
  * concurrent first calls for the same key would both run the fit and
  * race `dropWithLocation` + `saveAsTable` on the same table names,
  * risking a corrupted saved artifact. `ConcurrentHashMap
  * .computeIfAbsent` holds the key's bin lock for the duration of the
  * build, so the fit-and-save runs at most once per (process, key);
  * callers for other keys proceed independently (modulo bin collisions).
  */
private[graft] final class SavedOnce[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()
  /** Same call shape as `TrieMap.getOrElseUpdate`, but atomic per key. */
  def getOrElseUpdate(k: K, build: => V): V =
    m.computeIfAbsent(k, _ => build)
}

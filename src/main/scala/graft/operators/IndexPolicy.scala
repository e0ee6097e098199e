package graft.operators

/** Index-family auto-selection — the planner rule that closes the ANN
  * serving stack (VERDICT r14 ask 5): given plan-time-derivable stats
  * (corpus size, vector dim, the predicate's allowed-row count, a
  * serving-memory budget), choose which of the four gated families
  * answers a top-k query. Every threshold is a pure function of
  * counts, so an oracle re-derives the choice from the same counts
  * (q501/q518's policy discipline) and the decision replays at any
  * scale factor.
  *
  * The ladder, and why each rung is where it is:
  *
  *  - '''flat''' when the predicate keeps fewer than `switchBelow`
  *    rows: an exact scan of the allowed set is both CORRECT by
  *    construction and cheaper than any index walk's bookkeeping at
  *    that cardinality — the Qdrant-style cardinality switch already
  *    gated standalone at q478. Note the guard is on `allowed`, not
  *    `n`: a tiny corpus is just the unfiltered special case
  *    (allowed = n < switchBelow).
  *  - '''ivfpq''' when the raw vectors (n·dim·8 bytes) exceed the
  *    serving-memory budget: the code table is M bytes/vector (16×
  *    smaller at this pack's geometry), and at 100 TB the budget —
  *    not recall — is the binding constraint (Jégou et al. 2011's
  *    original motivation; the ADC + re-rank stack is gated at
  *    q483/q507/q510). Checked BEFORE the graph/ivf split because a
  *    family that does not fit in memory is not a candidate at all.
  *  - '''graph''' for UNFILTERED serves that fit in memory
  *    (allowed = n): the NN-descent + beam stack wins recall-per-
  *    distance-computation when no predicate thins the walk
  *    (q472/q474); under selective predicates it needs per-label
  *    overlays (q475) — a build-time artifact the planner cannot
  *    conjure at serve time, so filtered queries fall through.
  *  - '''ivf''' otherwise (filtered, fits in memory): the probe list
  *    is the one structure that adapts to selectivity at SERVE time
  *    ([[Similarity.probesForSelectivity]], q518) — no per-predicate
  *    build artifacts needed.
  *
  * Monotone by construction (IndexPolicySpec pins all four axes):
  * shrinking `allowed` only ever moves the choice toward flat;
  * shrinking `bytesBudget` only ever moves it toward ivfpq; growing
  * `n` at fixed budget only ever moves it toward ivfpq; and the
  * choice is scale-free in (n, allowed) for the flat rung.
  */
object IndexPolicy {

  val Flat = "flat"
  val Ivf = "ivf"
  val IvfPq = "ivfpq"
  val Graph = "graph"

  /** Default cardinality switch — q478's gated value. */
  val SwitchBelow = 150L

  /** Raw-vector bytes the non-PQ families must hold resident. */
  def rawBytes(n: Long, dim: Int): Long = n * dim * 8L

  /** Choose the serving family. `allowed` is the predicate's
    * matching-row count (= n when unfiltered); `bytesBudget` the
    * serving tier's resident-vector budget in bytes.
    */
  def choose(n: Long, dim: Int, allowed: Long, bytesBudget: Long,
      switchBelow: Long = SwitchBelow): String = {
    require(n >= 0 && dim >= 1 && allowed >= 0 && allowed <= n &&
      bytesBudget > 0 && switchBelow >= 0,
      s"choose($n, $dim, $allowed, $bytesBudget, $switchBelow)")
    if (allowed < switchBelow) Flat
    else if (rawBytes(n, dim) > bytesBudget) IvfPq
    else if (allowed == n) Graph
    else Ivf
  }
}

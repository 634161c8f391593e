package graft.lake

/** A snapshot-publish race was lost (another writer committed the same
  * version first) or a rebase onto the new head is not sound. Extends
  * IllegalStateException for source compatibility with callers that
  * matched the old failure type. Thrown:
  *  - transiently inside commit paths that then REBASE and retry
  *    (merge-on-read deltas and appends compose with any interim commit
  *    except layout changes; copy-on-write merges compose when the
  *    interim commits touched disjoint buckets);
  *  - to the caller when the conflict is real (overlapping-bucket
  *    rewrite, concurrent rebucket/rollback/schema change) — state is
  *    intact, the batch was not recorded, and re-running the commit
  *    against the new head is the remediation (idempotence keys make
  *    that safe to do blindly). */
class ConcurrentCommitException(msg: String) extends IllegalStateException(msg)

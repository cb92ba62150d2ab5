"""Multi-table publish: the client-side analog of the reference
server's `commit-transaction` route (multi-table commits,
/root/reference/ice-rest-catalog/.../rest/Route.java and
RESTCatalogAdapter.commit), rebuilt on the WAP primitives.

Independent tables have independent CAS files, so true cross-table
atomicity needs a coordinator none of this engine's backends provide
(the reference gets it from a single etcd transaction). What IS
achievable client-side — and what this module does — is a saga:

1. VALIDATE: every (table, branch) must exist and be fast-forwardable
   from the table's current snapshot. Fail anything here and nothing
   has moved.
2. PUBLISH in order. Each publish is that table's atomic CAS
   fast-forward.
3. COMPENSATE on failure: already-published tables are rolled back to
   their pre-publish snapshot (history-preserving rollback snapshots,
   so the attempt is auditable), and the failed transaction reports
   exactly what happened.

The window between validate and publish is real (another writer can
land between them — the publish then fails its own fast-forward check
and triggers compensation) and the compensation itself can fail (a
writer landing after OUR publish makes rollback unsafe — that table
is reported as 'stuck' rather than silently un-rolled-back). Both
windows are inherent to coordinator-free multi-table commits; the
report makes them visible instead of pretending atomicity."""

from __future__ import annotations

from ice_spark.catalog.table import CommitConflictError


def publish_all(catalog, stages: list[tuple[str, str]]) -> dict:
    """Publish staged branches across tables, all-or-(rolled-back)-
    nothing. stages: [(table identifier, branch name)].
    Returns {published: [...], ...} or raises CommitConflictError with
    compensation details."""
    # phase 1: validate everything before moving anything
    plan = []
    for ident, branch in stages:
        t = catalog.load_table(ident)
        refs = t.refs()
        if branch not in refs:
            raise ValueError(f"{ident}: no such branch {branch!r}")
        sid = refs[branch]
        snap = t.snapshot(sid)
        if snap is None:
            raise ValueError(f"{ident}: branch {branch} points at a missing snapshot")
        cur = t.meta.get("current_snapshot_id")
        if snap.get("parent_snapshot_id") != cur:
            raise CommitConflictError(
                f"{ident}: branch {branch} is not a fast-forward; "
                "nothing was published"
            )
        plan.append((ident, branch, t, cur))

    # phase 2: publish in order; phase 3: compensate on failure
    published: list[tuple[str, str, object, int, int]] = []
    for ident, branch, t, pre_sid in plan:
        try:
            post_sid = t.publish_branch(branch)
            published.append((ident, branch, t, pre_sid, post_sid))
        except Exception as e:
            rolled_back, stuck = [], []
            for p_ident, p_branch, p_t, p_pre, p_post in reversed(published):
                try:
                    p_t.refresh()
                    if p_t.meta.get("current_snapshot_id") != p_post:
                        # a writer landed after OUR publish; rolling
                        # back would destroy their commit — leave it
                        stuck.append(p_ident)
                        continue
                    p_t.rollback(p_pre)
                    # re-tag the staged snapshot so its files stay
                    # expiry-pinned; the stage must be REDONE before a
                    # retry (current is now the rollback snapshot)
                    p_t.set_ref(p_branch, snapshot_id=p_post)
                    rolled_back.append(p_ident)
                except Exception:
                    stuck.append(p_ident)
            raise CommitConflictError(
                f"multi-table publish failed at {ident} ({e}); "
                f"rolled back: {rolled_back}; "
                + (f"STUCK (manual repair needed): {stuck}" if stuck else "no tables stuck")
            ) from e
    return {"published": [(i, b) for i, b, *_ in published]}

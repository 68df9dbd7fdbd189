"""Generic distributed fixed-point iteration — the loop machinery every
iterative DataFrame algorithm re-derives, factored once.

Spark has no native iteration primitive: a loop that reuses its previous
frame N times builds a 2^N lineage (each round's plan references the
prior round's plan wherever the step touches it twice), and convergence
detection naively costs an extra count() job per round.  pagerank,
label_propagation and the connected-components Pregel loop each
hand-rolled the same three mitigations; :func:`iterate` packages them so
the NEXT iterative algorithm (SSSP, HITS, random walks, iterative
closeness) starts from a correct loop instead of re-learning these:

* **lineage truncation** — the state frame is materialized
  executor-locally (``localCheckpoint(eager=True)`` — NOT a driver
  collect, NOT a HDFS checkpoint) every ``checkpoint_every`` rounds, so
  the optimizer sees a leaf instead of an exponentially growing tree
  (measured on label_propagation: 18.0 s → 8.7 s at sf0.1; on pagerank a
  1.6k-node graph took 14.4 s WITHOUT truncation);
* **in-pass convergence detection** — the step function may attach a
  boolean ``changed_col`` computed inside its own projection (zero extra
  joins/jobs); :func:`iterate` probes it with a ``filter(...).isEmpty()``
  limit-1 scan over the just-materialized partitions — no recompute — and
  stops early.  Steps that omit the column run exactly ``max_rounds``
  times (the fixed-unroll semantics the hash-gated graph queries need:
  a data-dependent stopping round would make results depend on
  convergence-detection timing, which no SQL oracle can replay);
* **bounded state** — only the state frame crosses rounds; corpus-sized
  inputs (edge lists) stay cached OUTSIDE the loop in the caller, the
  pagerank/LPA posture.

100 TB shape: per round the driver launches the step's jobs and one
limit-1 probe; all data movement is whatever the step itself shuffles.
The state materialization is executor-local disk/memory, never the
driver.  ``localCheckpoint`` does mean executor loss forces a
recompute-from-truncated-lineage failure (Spark re-runs the job); for
multi-hour loops on preemptible fleets pass
``checkpoint_dir`` to use resilient ``checkpoint`` instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: partition count iterative state coalesces to when the caller knows
#: the state is small (its _state_hint resolved to the broadcast
#: regime) — see iterate(coalesce_to=)
ITER_STATE_PARTITIONS = 4


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_rounds: int,
    changed_col: str = "_changed",
    checkpoint_every: int = 1,
    checkpoint_dir: str | None = None,
    coalesce_to: int | None = None,
) -> DataFrame:
    """Run ``state ← step(state, round)`` up to ``max_rounds`` times.

    ``step`` takes the current state frame and the 0-based round number
    and returns the next state.  If the returned frame carries a boolean
    ``changed_col``, the loop stops early on the first materialized
    round where no row has it true; the column is stripped from the
    state between rounds and from the final result.  Convergence is only
    PROBED on rounds that materialize (every ``checkpoint_every``-th),
    so with ``checkpoint_every > 1`` the loop can overshoot the fixpoint
    by up to ``checkpoint_every − 1`` cheap rounds — steps are required
    to be idempotent at the fixpoint (step(fix) == fix), which every
    monotone propagation step is.

    ``coalesce_to``: narrow the state to this many partitions before
    each materialization (plan-only ``coalesce`` — it collapses into
    the producing shuffle's reduce side, so the final aggregate of the
    round RUNS at this width rather than adding a stage).  The r13
    verdict's iterative-family finding: at sf0.1 every round's state is
    a few thousand rows spread over 32 shuffle partitions, and the
    fixed task-launch tax (≈2 s/round × 8 rounds on x_kcore) dwarfs
    the data; callers whose :func:`_state_hint` resolved to the
    broadcast regime (state known small) pass
    :data:`ITER_STATE_PARTITIONS`, callers in the shuffle regime pass
    ``None`` — a billion-row state must keep its width.  Results are
    identical either way (partitioning is never semantics here; every
    gated hash was re-verified unchanged).

    Returns the final state (without ``changed_col``).  The returned
    frame carries ``_iterate_converged`` (r15): ``True`` iff a
    materialized-round probe saw ZERO ``changed_col`` rows — i.e. the
    loop itself already PROVED ``step(state) == state``, so callers
    that would otherwise run one extra verification round
    (strongly_connected_components' exhaustion guards) can skip it;
    ``False`` when the step has no ``changed_col`` (fixed unroll) or
    the flag was probe-positive through the last round.

    **Call-once contract (r16, formalizing what louvain relies on):**
    ``iterate`` calls ``step`` exactly once per round, in round order,
    and never replays a round.  Steps are therefore ALLOWED to carry
    round-indexed closure state (louvain's contracted community
    multigraph advances inside its step) — which in turn means tooling
    MUST NOT invoke ``step`` out-of-band: an extra ``step(state, 0)``
    probe call silently advances such closure state one round ahead.
    Plan-capture spies wrap ``step`` and record round 0's RETURN value
    from inside the real loop instead (tools/capture_plans.py).
    """
    if max_rounds < 0:
        raise ValueError(f"iterate: max_rounds must be >= 0, got {max_rounds}")
    if checkpoint_every < 1:
        raise ValueError(
            f"iterate: checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    if coalesce_to is not None and coalesce_to < 1:
        raise ValueError(
            f"iterate: coalesce_to must be >= 1 or None, got {coalesce_to}"
        )
    if checkpoint_dir is not None:
        state.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _materialize(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    converged = False
    for i in range(max_rounds):
        nxt = step(state, i)
        has_flag = changed_col in nxt.columns
        materializing = ((i + 1) % checkpoint_every == 0) or i == max_rounds - 1
        if materializing:
            if coalesce_to is not None:
                nxt = nxt.coalesce(coalesce_to)
            nxt = _materialize(nxt)
        state = nxt.drop(changed_col) if has_flag else nxt
        # probe only materialized rounds: the limit-1 isEmpty scan then
        # reads already-computed partitions instead of re-running the step
        if has_flag and materializing and nxt.filter(F.col(changed_col)).isEmpty():
            converged = True
            break
    state._iterate_converged = converged
    return state

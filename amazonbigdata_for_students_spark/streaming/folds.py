"""Executor-side stateful fold functions for applyInPandasWithState.

LEAF MODULE — imports nothing from this package. Module-level fold
functions are cloudpickled BY REFERENCE, so Spark's Python workers import
the defining module; a fold living in batch_twins would drag the whole
plans registry (and its circular sources_ops edge) into every executor.
Keeping folds here makes the worker import trivially safe and lets tests
drive the exact function the registered streaming queries run.
"""

from __future__ import annotations


def token_bucket_fold(key, pdfs, state):
    """Token-bucket admission fold for stream_token_bucket. State:
    (tokens_milli, admitted, n, last_t) — last event time carried across
    micro-batches so inter-batch gaps refill exactly like intra-batch
    ones. Capacity 10 tokens (10000 milli), refill 1 token/sec, cost 1
    token/event; exact integer arithmetic, same recurrence as the batch
    twin's aggregate() fold."""
    import pandas as pd  # executor-side

    objs = list(pdfs)
    if not objs:  # timed-out key invocation: pd.concat([]) would raise
        return
    rows = pd.concat(objs, ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["ts", "event_id"])
    if state.exists:
        tok, adm, n, last_t = state.get
    else:
        tok, adm, n, last_t = 10000, 0, 0, None
    for t in rows["t"].to_numpy():
        t = int(t)
        dt = 0 if last_t is None else t - last_t
        tok = min(10000, tok + dt * 1000)
        if tok >= 1000:
            tok -= 1000
            adm += 1
        n += 1
        last_t = t
    state.update((tok, adm, n, last_t))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_admitted": [adm],
            "tokens_end_scaled": [tok],
        }
    )

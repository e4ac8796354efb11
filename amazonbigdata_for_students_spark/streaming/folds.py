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


# --- SPRT constants: ONE definition for the batch eval, the streaming ---
# fold, and (via f-string interpolation in plans/evals.py) both engines'
# SQL — the twin-oracle-constant discipline. Living here (the leaf
# module) because the executor-side fold below must read them without
# dragging the plans registry into Python workers.
import math as _math

SPRT_P0, SPRT_P1 = 0.10, 0.30
SPRT_ALPHA = SPRT_BETA = 0.05


def _sprt_nano(x: float) -> int:
    """floor(x*1e9 + 0.5): the repo-wide ln quantization."""
    return _math.floor(x * 1e9 + 0.5)


SPRT_L1 = _sprt_nano(_math.log(SPRT_P1 / SPRT_P0))
SPRT_L0 = _sprt_nano(_math.log((1 - SPRT_P1) / (1 - SPRT_P0)))
SPRT_A = _sprt_nano(_math.log((1 - SPRT_BETA) / SPRT_ALPHA))
SPRT_B = _sprt_nano(_math.log(SPRT_BETA / (1 - SPRT_ALPHA)))


def sprt_walk_fold(key, pdfs, state):
    """Per-day SPRT walk for stream_sprt_monitor. State: (cum, n,
    first_rn, dec_llr) — the cumulative LLR and observation count carry
    across micro-batches; once the walk first exits (SPRT_B, SPRT_A)
    the decision step and its LLR freeze (first-crossing semantics),
    while n keeps counting so the batch twin's n_obs matches."""
    import pandas as pd  # executor-side

    objs = list(pdfs)
    if not objs:
        return
    rows = pd.concat(objs, ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["ts", "event_id"])
    if state.exists:
        cum, n, first_rn, dec_llr = state.get
    else:
        cum, n, first_rn, dec_llr = 0, 0, 0, 0
    for inc in rows["inc"].to_numpy():
        cum += int(inc)
        n += 1
        if first_rn == 0 and (cum >= SPRT_A or cum <= SPRT_B):
            first_rn = n
            dec_llr = cum
    # Saturate cum at the int64 state-schema boundary (Python ints are
    # unbounded; the long-typed GroupState would silently WRAP). Safe:
    # an undecided walk is confined to (SPRT_B, SPRT_A) by definition,
    # so only post-decision accumulation — which never feeds output or
    # the frozen decision — can reach the clamp. Matches the batch
    # twin's decimal(38,0) no-wrap contract (eval_sprt_boundary).
    _I64 = (1 << 63) - 1
    cum = max(-_I64 - 1, min(_I64, cum))
    state.update((cum, n, first_rn, dec_llr))
    decided = first_rn > 0
    yield pd.DataFrame(
        {
            "day_no": [key[0]],
            "n_obs": [n],
            "n_steps": [first_rn if decided else n],
            "decision": [
                ("accept_h1" if dec_llr >= SPRT_A else "accept_h0")
                if decided
                else "undecided"
            ],
            "llr_nano": [dec_llr if decided else cum],
        }
    )


# --- Holt-Winters constants + fold (twin of plans/relational.py's ---
# generated SQL folds; alpha = 1/4, beta = 1/10, gamma = 1/5, m = 7)
HW_M = 7


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — both engines' semantics
    for the SQL div/// the batch folds use (python's // floors, so the
    sign needs handling here)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def holt_winters_fold(key, pdfs, state):
    """Per-type streaming Holt-Winters walk for stream_holt_winters.
    State: (pend_day, pend_n, lvl, trd, step, s0..s6) — a day's count
    accumulates in `pending` until a LATER day arrives, then flushes
    into the triple-smoothing recurrence (a day straddling micro-batches
    must enter the recurrence exactly once, complete). The emitted
    snapshot applies the still-pending day as a final step WITHOUT
    storing it, so each batch reports 'the state if the stream ended
    now' while later batches can still extend that day."""
    import pandas as pd  # executor-side

    objs = list(pdfs)
    if not objs:
        return
    rows = pd.concat(objs, ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["d"])
    if state.exists:
        st = list(state.get)
    else:
        st = [-1, 0, 0, 0, 0] + [0] * HW_M + [0]  # trailing slot: n_obs

    def step_into(vals, x_m):
        lvl, trd, k = vals[2], vals[3], vals[4]
        seas = vals[5:5 + HW_M]
        idx = k % HW_M
        lp = _trunc_div(x_m - seas[idx], 4) + _trunc_div(3 * (lvl + trd), 4)
        tp = _trunc_div(lp - lvl, 10) + _trunc_div(9 * trd, 10)
        seas[idx] = _trunc_div(x_m - lp, 5) + _trunc_div(4 * seas[idx], 5)
        return vals[:2] + [lp, tp, k + 1] + seas + vals[5 + HW_M:]

    for d, n in rows.groupby("d")["one"].sum().items():
        d = int(d)
        if st[0] == -1:
            st[0], st[1] = d, 0
        if d > st[0]:
            st = step_into(st, st[1] * 1000)
            st[0], st[1] = d, 0
        st[1] += int(n)
        st[5 + HW_M] += int(n)
    state.update(tuple(st))
    n_obs = st[5 + HW_M]
    view = step_into(st, st[1] * 1000) if st[0] != -1 else st
    n_days = view[4]
    nxt = view[5 + (n_days % HW_M)]
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            # strictly-monotone snapshot selector: a batch that only
            # EXTENDS the open day leaves n_days unchanged but must still
            # outrank the earlier snapshot (n_days alone would tie and
            # make the final-row pick nondeterministic)
            "n_obs_total": [n_obs],
            "n_days": [n_days],
            "level_milli": [view[2]],
            "trend_milli": [view[3]],
            "season_next_milli": [nxt],
            "forecast_next_milli": [view[2] + view[3] + nxt],
        }
    )


# --- streaming CUSUM (Page 1954) constants + fold ---
CUSUM_BURN = 24          # burn-in cells establishing the reference rate
CUSUM_SLACK_DIV = 10     # slack = mu // 10 (10% allowance per hour)
CUSUM_T_MULT = 5         # alert threshold = 5 * mu (5 mean-hours of drift)
CUSUM_SCALE = 1_000_000


def cusum_close_cell(st: list, h: int, x: int) -> list:
    """Advance the CUSUM walk by one CLOSED hourly cell (count x at hour
    h). Shared by the flush path and the snapshot look-ahead so a batch
    reports 'the walk if the stream ended now' without storing the open
    hour. State layout: [pend_h, pend_n, n_cells, burn_sum, mu_s, cum,
    mn, alert_h, max_drift, n_obs]; mu_s = -1 until the burn-in
    completes, alert_h = -1 until the first crossing (first-crossing
    freeze, like the SPRT walk)."""
    ph, pn, ncl, bs, mu, cum, mn, ah, mx, no = st
    ncl += 1
    if ncl <= CUSUM_BURN:
        bs += x
        if ncl == CUSUM_BURN:
            mu = bs * CUSUM_SCALE // CUSUM_BURN
    else:
        cum += x * CUSUM_SCALE - (mu + mu // CUSUM_SLACK_DIV)
        if cum < mn:
            mn = cum
        drift = cum - mn  # mn starts at 0: drift = c - least(0, min c)
        if drift > mx:
            mx = drift
        if ah == -1 and drift >= CUSUM_T_MULT * mu:
            ah = h
    return [ph, pn, ncl, bs, mu, cum, mn, ah, mx, no]


def cusum_fold(key, pdfs, state):
    """Per-type streaming CUSUM changepoint walk for stream_cusum_monitor.
    Hour-cell flush discipline is holt_winters_fold's: an hour's count
    accumulates in `pending` until a LATER hour arrives (a cell
    straddling micro-batches enters the walk exactly once, complete);
    the snapshot applies the still-open hour as a look-ahead step
    WITHOUT storing it. The int64 state boundary cannot wrap: cum moves
    at most x*1e6 per cell and the walk is drift-bounded by the alert
    freeze envelope measured at sf1 (see the sprt clamp note)."""
    import pandas as pd  # executor-side

    objs = list(pdfs)
    if not objs:
        return
    rows = pd.concat(objs, ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["h"])
    if state.exists:
        st = list(state.get)
    else:
        st = [-1, 0, 0, 0, -1, 0, 0, -1, 0, 0]
    for h, n in rows.groupby("h")["one"].sum().items():
        h, n = int(h), int(n)
        if st[0] == -1:
            st[0], st[1] = h, 0
        if h > st[0]:
            st = cusum_close_cell(st, st[0], st[1])
            st[0], st[1] = h, 0
        st[1] += n
        st[9] += n
    state.update(tuple(st))
    view = cusum_close_cell(list(st), st[0], st[1]) if st[0] != -1 else list(st)
    if view[2] <= CUSUM_BURN:
        # no post-burn-in walk step yet: the batch oracle's walk CTE has
        # no rows for this type (rn > BURN) and its inner join drops it —
        # a series with EXACTLY 24 cells must also emit nothing here
        # (/code-review r9 find: the earlier mu-set guard emitted a row
        # at ncl == 24 that the oracle never produces)
        return
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_obs_total": [st[9]],  # strictly monotone snapshot selector
            "n_cells": [view[2]],
            "mu_scaled": [view[4]],
            "first_alert_h": [None if view[7] == -1 else view[7]],
            "max_drift": [view[8]],
        }
    )


# --- streaming SLO burn-rate constants + fold (twin of ---
# plans/relational.py's ops_slo_burn_rate literals: 20% budget ->
# burn = err * 5e6 // n; fast window >= 1.1e6 AND slow >= 1.05e6)
SLO_FAST_PPM = 1_100_000
SLO_SLOW_PPM = 1_050_000
SLO_WINDOW = 6  # slow window: current + 5 preceding hours (RANGE)


def slo_close_cell(st: list, emit: list, h: int, n: int, e: int) -> list:
    """Close one hourly cell against the last-5-closed ring, append its
    row (with alert verdict) to emit, and rotate the ring. Shared by the
    flush path and the snapshot look-ahead (which passes a COPY of the
    state so the open hour is never stored). Ring slots may hold cells
    older than h-5 after a traffic gap — the RANGE semantics filter at
    compute time, exactly like the batch twin's RANGE frame."""
    ring = st[3:18]  # 5 x (h, n, err), oldest first
    n6, e6 = n, e
    for j in range(0, 15, 3):
        if ring[j] >= 0 and ring[j] >= h - (SLO_WINDOW - 1):
            n6 += ring[j + 1]
            e6 += ring[j + 2]
    burn1 = e * 5_000_000 // n
    burn6 = e6 * 5_000_000 // n6
    emit.append(
        (h, n, e, burn1, burn6, burn1 >= SLO_FAST_PPM and burn6 >= SLO_SLOW_PPM)
    )
    st = st[:3] + ring[3:] + [h, n, e] + st[18:]  # rotate oldest out
    return st


def slo_burn_fold(key, pdfs, state):
    """Global-series streaming SLO burn monitor for
    stream_slo_burn_monitor. A real SLO is ONE series, so the fold runs
    single-keyed (state: pending cell + 5-cell ring + n_obs = 19
    longs); hour cells straddling micro-batches use the pending-flush
    discipline, and each batch re-emits the open hour as a look-ahead
    row. Every closed hour emits (not just alerts): a partial hour can
    look like an alert and then cool off, so the verdict must be
    re-selectable per hour — the registered query filters alert rows
    AFTER final-snapshot selection."""
    import pandas as pd  # executor-side

    objs = list(pdfs)
    if not objs:
        return
    rows = pd.concat(objs, ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["h"])
    if state.exists:
        st = list(state.get)
    else:
        st = [-1, 0, 0] + [-1, 0, 0] * 5 + [0]
    emit: list = []
    g = rows.groupby("h").agg(n=("one", "sum"), e=("err", "sum"))
    for h, row in g.iterrows():
        h, n, e = int(h), int(row["n"]), int(row["e"])
        if st[0] == -1:
            st[0], st[1], st[2] = h, 0, 0
        if h > st[0]:
            st = slo_close_cell(st, emit, st[0], st[1], st[2])
            st[0], st[1], st[2] = h, 0, 0
        st[1] += n
        st[2] += e
        st[18] += n
    state.update(tuple(st))
    if st[0] != -1:
        slo_close_cell(list(st), emit, st[0], st[1], st[2])  # look-ahead
    if not emit:
        return
    yield pd.DataFrame(
        {
            "h": [r[0] for r in emit],
            "n_1h": [r[1] for r in emit],
            "err_1h": [r[2] for r in emit],
            "burn1_ppm": [r[3] for r in emit],
            "burn6_ppm": [r[4] for r in emit],
            "alert": [r[5] for r in emit],
            "n_obs_total": [st[18]] * len(emit),
        }
    )


def funnel_stage_fold(key, pdfs, state):
    """Per-user streaming funnel tracker for stream_funnel_stage.
    State: (v_us, c_us, p_us, n) — the first-passage chain
    view -> click-strictly-after -> purchase-strictly-after, advanced
    incrementally (first view seen; first click with ts > v; first
    purchase with ts > c). Matches the batch chain exactly under the
    update-twin ordering contract (per-key event time nondecreasing
    across batches); within a batch rows sort by (ts, event_id).
    Sentinel -1 = stage not reached."""
    import pandas as pd  # executor-side

    objs = list(pdfs)
    if not objs:
        return
    rows = pd.concat(objs, ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["us", "event_id"])
    if state.exists:
        v, c, p, n = state.get
    else:
        v, c, p, n = -1, -1, -1, 0
    for t, us in zip(rows["event_type"].to_numpy(), rows["us"].to_numpy()):
        us = int(us)
        n += 1
        if v == -1 and t == "view":
            v = us
        elif v != -1 and c == -1 and t == "click" and us > v:
            c = us
        elif c != -1 and p == -1 and t == "purchase" and us > c:
            p = us
    state.update((v, c, p, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "funnel_stage": [3 if p != -1 else 2 if c != -1 else 1 if v != -1 else 0],
        }
    )


def croston_fold(key, pdfs, state):
    """Per-user streaming Croston walk for stream_croston_monitor.
    State: (pend_day, pend_z, sz, iv, pd, t, nobs) — a purchase day's
    demand accumulates in `pending` until a LATER day arrives, then
    flushes into the size/interval recurrences exactly once, complete
    (the holt_winters_fold day-straddle contract). The emitted snapshot
    applies the still-pending day as a final step WITHOUT storing it,
    so each batch reports 'the state if the stream ended now'; nobs
    (total demand observed) is the strictly-monotone snapshot selector.
    Recurrences mirror timeseries_croston exactly: first demand seeds
    (sz=z1, iv=1, pd=d1, t=1); each later flush of (d, z) applies
    sz' = (z + 3sz) div 4, iv' = ((d - pd) + 3iv) div 4 with the same
    truncating division both engines use."""
    import pandas as pd  # executor-side

    objs = list(pdfs)
    if not objs:
        return
    rows = pd.concat(objs, ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["d"])
    if state.exists:
        st = list(state.get)
    else:
        st = [-1, 0, 0, 0, 0, 0, 0]  # pend_day pend_z sz iv pd t nobs

    def flush(vals):
        pd_day, z = vals[0], vals[1]
        sz, iv, prev, t = vals[2], vals[3], vals[4], vals[5]
        if t == 0:
            return [pd_day, z, z, 1, pd_day, 1, vals[6]]
        sz2 = _trunc_div(z + 3 * sz, 4)
        iv2 = _trunc_div((pd_day - prev) + 3 * iv, 4)
        return [pd_day, z, sz2, iv2, pd_day, t + 1, vals[6]]

    for d, z in rows.groupby("d")["one"].sum().items():
        d, z = int(d), int(z)
        if st[0] == -1:
            st[0], st[1] = d, 0
        if d > st[0]:
            st = flush(st)
            st[0], st[1] = d, 0
        st[1] += z
        st[6] += z
    state.update(tuple(st))
    view = flush(st) if st[0] != -1 else st
    sz, iv, t = view[2], view[3], view[5]
    rate = 0 if iv == 0 else (sz * 1_000_000) // iv
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "nobs": [st[6]],
            "n_demands": [t],
            "size_level": [sz],
            "interval_level": [iv],
            "demand_rate_ppm": [rate],
        }
    )

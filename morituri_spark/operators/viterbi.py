"""Viterbi sequence decoding — min-cost paths through per-key trellises.

The stateful sequence decoder the map-matching family needs (geo/
matching.py snaps each point independently; this makes the per-step
choices COHERENT along a track): given per-(key, step) candidate states
with integer emission costs and an integer transition model, compute for
every candidate the minimum cumulative cost of any state path reaching
it (the Viterbi DP table), and flag the states on the backtracked
optimal path. Same operator family as HMM part-of-speech tagging over
token sequences — an LLM-pipeline member too.

Transition models:
  * dense matrix (``transitions`` DataFrame (state_from, state_to,
    t_cost)) — model parameters, S×S with small S (POS tags, a few
    hundred road classes). Collected once on the driver and shipped in
    the kernel closure — a dimension table, same budget class as the
    IVF centroids (ml/simsearch.py).
  * uniform switch (``switch_cost``) — stay = 0, change = λ, closed
    form at ANY state-space size (street-segment matching where S is
    the network size and S² can never materialize).

Scale shape: ONE shuffle keyed by the sequence key, then the whole DP
runs inside one Arrow batch per key (applyInPandas hands the full
group — rule 26's whole-group fold is automatic here). Per-key cost is
O(T·S_step²) vectorized NumPy on int64 — exact, no float accumulation.
Keys are uniformly distributed tracks/documents; there is no hot key by
construction (a single sequence is one group; bound sequence length
upstream with chunking if tracks are unbounded).

Determinism: all costs int64; the backtracked path breaks ties by the
smaller state id at every choice (final state: min (cost, state);
predecessors: min achieving state id), so the ``on_path`` flags are a
pure function of the inputs — replayable in ANSI SQL as unrolled
materialized DP stages (rule 27).

Reference scope: no counterpart in morituri; extends the matching
family (geo/matching.py cites plugins/navteq/navteq.hpp link records).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_OUT_SCHEMA = (
    "key long, step long, state long, cost long, on_path boolean"
)


def viterbi_costs(
    emissions: DataFrame,
    transitions: Optional[DataFrame] = None,
    switch_cost: int = 0,
    key_col: str = "key",
    step_col: str = "step",
    state_col: str = "state",
    cost_col: str = "e_cost",
) -> DataFrame:
    """→ (key, step, state, cost, on_path): the Viterbi DP table per
    sequence key plus the optimal-path flags.

    ``emissions``: one row per candidate state at a step — (key, step,
    state, e_cost), integer costs, steps decoded in ascending order
    (gaps allowed; consecutive DISTINCT steps transition directly).
    ``transitions``: optional dense (state_from, state_to, t_cost)
    model; states must then be 0-based indices < its dimension, and
    pairs absent from it are forbidden (treated as +inf). Without it,
    the uniform switch model applies: stay 0, change ``switch_cost``.
    A candidate unreachable from every previous-step candidate gets no
    output row (unreachable states cannot carry a path).
    """
    if transitions is not None:
        t = transitions.select(
            F.col("state_from").cast("long"),
            F.col("state_to").cast("long"),
            F.col("t_cost").cast("long"),
        ).collect()
        n = int(max(max(r[0] for r in t), max(r[1] for r in t))) + 1 if t else 0
        tmat = np.full((n, n), np.iinfo(np.int64).max, dtype=np.int64)
        for r in t:
            tmat[r[0], r[1]] = r[2]
    else:
        tmat = None
    lam = int(switch_cost)
    inf = np.iinfo(np.int64).max

    def _decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["step", "state"], kind="mergesort")
        key = int(pdf["key"].iloc[0])
        steps = pdf["step"].unique()
        out_step, out_state, out_cost = [], [], []
        prev_states = prev_costs = None
        layers = []  # (step, states, costs) per decoded layer
        for s in steps:
            layer = pdf[pdf["step"] == s]
            st = layer["state"].to_numpy(np.int64)
            em = layer["e_cost"].to_numpy(np.int64)
            if prev_states is None:
                cost = em.copy()
            else:
                if tmat is not None:
                    tr = tmat[np.ix_(prev_states, st)]
                else:
                    tr = np.where(
                        prev_states[:, None] == st[None, :], 0, lam
                    ).astype(np.int64)
                reach = (prev_costs[:, None] != inf) & (tr != inf)
                tot = np.where(reach, prev_costs[:, None] + tr, inf)
                best = tot.min(axis=0)
                cost = np.where(best == inf, inf, best + em)
            keep = cost != inf
            st, cost = st[keep], cost[keep]
            if len(st) == 0:
                # a fully unreachable layer breaks the chain; later steps
                # restart as if first, and on_path covers only the final
                # chain (documented edge semantics)
                prev_states = prev_costs = None
                layers = []
                continue
            layers.append((int(s), st, cost))
            out_step.extend([int(s)] * len(st))
            out_state.extend(st.tolist())
            out_cost.extend(cost.tolist())
            prev_states, prev_costs = st, cost
        # backtrack: min (cost, state) at the last layer, then the min
        # achieving predecessor at each earlier layer
        on = {}
        if layers:
            _, st, cost = layers[-1]
            j = np.lexsort((st, cost))[0]
            chosen = (layers[-1][0], int(st[j]))
            on[chosen] = True
            cur_cost = int(cost[j])
            cur_state = int(st[j])
            for li in range(len(layers) - 2, -1, -1):
                s_prev, st_p, cost_p = layers[li]
                em_cur = pdf[
                    (pdf["step"] == layers[li + 1][0])
                    & (pdf["state"] == cur_state)
                ]["e_cost"].iloc[0]
                if tmat is not None:
                    tr = tmat[st_p, cur_state]
                else:
                    tr = np.where(st_p == cur_state, 0, lam).astype(np.int64)
                ok = (cost_p != inf) & (tr != inf)
                need = cur_cost - int(em_cur)
                ach = ok & (cost_p + tr == need)
                cand = st_p[ach]
                pick = int(cand.min())
                on[(s_prev, pick)] = True
                cur_cost = int(cost_p[ach][cand.argmin()])
                cur_state = pick
        return pd.DataFrame(
            {
                "key": np.int64(key),
                "step": np.asarray(out_step, dtype=np.int64),
                "state": np.asarray(out_state, dtype=np.int64),
                "cost": np.asarray(out_cost, dtype=np.int64),
                "on_path": [
                    on.get((s, int(t)), False)
                    for s, t in zip(out_step, out_state)
                ],
            }
        )

    em = emissions.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(step_col).cast("long").alias("step"),
        F.col(state_col).cast("long").alias("state"),
        F.col(cost_col).cast("long").alias("e_cost"),
    )
    return em.groupBy("key").applyInPandas(_decode, _OUT_SCHEMA)

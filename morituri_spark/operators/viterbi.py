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

    def _decode_key(
        key: int,
        step: np.ndarray,
        state: np.ndarray,
        ecost: np.ndarray,
        out: dict,
    ) -> None:
        """Decode ONE key's rows (pre-sorted by (step, state)) into the
        batch output accumulator — all-numpy, no pandas filtering.

        Identical DP and tie-breaking to the original per-group decode:
        within a layer states arrive sorted ascending, so the min-state
        predecessor is the FIRST index achieving the required cost."""
        bnd = np.flatnonzero(step[1:] != step[:-1]) + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(step)]))
        chunks = []  # every kept layer: (step_val, states, costs, flags)
        layers = []  # current unbroken chain: (states, costs, ems, flags)
        prev_states = prev_costs = None
        for s0, e0 in zip(starts, ends):
            st = state[s0:e0]
            em = ecost[s0:e0]
            sval = int(step[s0])
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
            st2, cost2, em2 = st[keep], cost[keep], em[keep]
            if len(st2) == 0:
                # a fully unreachable layer breaks the chain; later steps
                # restart as if first, and on_path covers only the final
                # chain (documented edge semantics)
                prev_states = prev_costs = None
                layers = []
                continue
            flags = np.zeros(len(st2), dtype=bool)
            chunks.append((sval, st2, cost2, flags))
            layers.append((st2, cost2, em2, flags))
            prev_states, prev_costs = st2, cost2
        if layers:
            st, cost, em2, flags = layers[-1]
            j = int(np.lexsort((st, cost))[0])
            flags[j] = True
            cur_cost, cur_em = int(cost[j]), int(em2[j])
            cur_state = int(st[j])
            for li in range(len(layers) - 2, -1, -1):
                st_p, cost_p, em_p, flags_p = layers[li]
                if tmat is not None:
                    tr = tmat[st_p, cur_state]
                else:
                    tr = np.where(st_p == cur_state, 0, lam).astype(np.int64)
                ach = (cost_p != inf) & (tr != inf) & (
                    cost_p + tr == cur_cost - cur_em
                )
                k = int(np.flatnonzero(ach)[0])  # states sorted → min id
                flags_p[k] = True
                cur_cost, cur_em = int(cost_p[k]), int(em_p[k])
                cur_state = int(st_p[k])
        for sval, st2, cost2, flags in chunks:
            n = len(st2)
            out["key"].append(np.full(n, key, dtype=np.int64))
            out["step"].append(np.full(n, sval, dtype=np.int64))
            out["state"].append(st2)
            out["cost"].append(cost2)
            out["on_path"].append(flags)

    def _run(batches):
        """mapInPandas driver: the partition arrives hash-clustered by
        key and sorted by (key, step, state); decode every COMPLETE key
        in each batch and carry the trailing key's rows into the next
        batch (a key can span Arrow batch boundaries — rule 26)."""
        pend = None  # (key, step, state, e_cost) arrays of the open key
        cols = ("key", "step", "state", "cost", "on_path")

        def _flush(out):
            if not out["key"]:
                return None
            return pd.DataFrame(
                {
                    "key": np.concatenate(out["key"]),
                    "step": np.concatenate(out["step"]),
                    "state": np.concatenate(out["state"]),
                    "cost": np.concatenate(out["cost"]),
                    "on_path": np.concatenate(out["on_path"]),
                }
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            key = pdf["key"].to_numpy(np.int64)
            step = pdf["step"].to_numpy(np.int64)
            state = pdf["state"].to_numpy(np.int64)
            ecost = pdf["e_cost"].to_numpy(np.int64)
            if pend is not None:
                key = np.concatenate((pend[0], key))
                step = np.concatenate((pend[1], step))
                state = np.concatenate((pend[2], state))
                ecost = np.concatenate((pend[3], ecost))
            # key boundaries; the LAST key stays pending (may continue)
            bnd = np.flatnonzero(key[1:] != key[:-1]) + 1
            starts = np.concatenate(([0], bnd))
            cut = starts[-1]
            out = {c: [] for c in cols}
            for s0, e0 in zip(starts[:-1], starts[1:]):
                _decode_key(
                    int(key[s0]), step[s0:e0], state[s0:e0], ecost[s0:e0],
                    out,
                )
            pend = (key[cut:], step[cut:], state[cut:], ecost[cut:])
            res = _flush(out)
            if res is not None:
                yield res
        if pend is not None and len(pend[0]):
            out = {c: [] for c in cols}
            _decode_key(int(pend[0][0]), pend[1], pend[2], pend[3], out)
            res = _flush(out)
            if res is not None:
                yield res

    em = emissions.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(step_col).cast("long").alias("step"),
        F.col(state_col).cast("long").alias("state"),
        F.col(cost_col).cast("long").alias("e_cost"),
    )
    # ONE hash exchange on key + one in-partition sort — the same
    # physical shape applyInPandas used, but the decoder now sees whole
    # BATCHES of keys per Python call instead of one tiny group each
    # (10k-group per-call overhead dominated the map-matching bench).
    return (
        em.repartition("key")
        .sortWithinPartitions("key", "step", "state")
        .mapInPandas(_run, _OUT_SCHEMA)
    )

"""viterbi_costs (operators/viterbi.py) vs a dict-based Python DP."""

import pytest

from morituri_spark.operators.viterbi import viterbi_costs

INF = float("inf")


def _ref(emissions, trans=None, lam=0):
    """emissions: {(key, step, state): e}; trans: {(sf, st): t} or None.
    Returns ({(key, step, state): cost}, {(key, step): path_state})."""
    bykey = {}
    for (k, s, st), e in emissions.items():
        bykey.setdefault(k, {}).setdefault(s, {})[st] = e

    def t_cost(a, b):
        if trans is not None:
            return trans.get((a, b), INF)
        return 0 if a == b else lam

    costs, paths = {}, {}
    for k, steps in bykey.items():
        order = sorted(steps)
        layers = []
        prev = None
        for s in order:
            cur = {}
            for st, e in steps[s].items():
                if prev is None:
                    cur[st] = e
                else:
                    best = min(
                        (c + t_cost(p, st) for p, c in prev.items()), default=INF
                    )
                    if best < INF:
                        cur[st] = best + e
            if not cur:
                prev = None
                layers = []
                continue
            layers.append((s, cur))
            for st, c in cur.items():
                costs[(k, s, st)] = c
            prev = cur
        if layers:
            s_last, cur = layers[-1]
            chosen = min(cur, key=lambda st: (cur[st], st))
            paths[(k, s_last)] = chosen
            cur_cost = cur[chosen]
            for li in range(len(layers) - 2, -1, -1):
                s_prev, lay = layers[li]
                e_cur = bykey[k][layers[li + 1][0]][chosen]
                need = cur_cost - e_cur
                ach = sorted(
                    st for st, c in lay.items() if c + t_cost(st, chosen) == need
                )
                chosen = ach[0]
                cur_cost = lay[chosen]
                paths[(k, s_prev)] = chosen
    return costs, paths


def _run(spark, emissions, trans=None, lam=0):
    edf = spark.createDataFrame(
        [(k, s, st, e) for (k, s, st), e in emissions.items()],
        "key long, step long, state long, e_cost long",
    )
    tdf = None
    if trans is not None:
        tdf = spark.createDataFrame(
            [(a, b, c) for (a, b), c in trans.items()],
            "state_from long, state_to long, t_cost long",
        )
    rows = viterbi_costs(edf, tdf, switch_cost=lam).collect()
    costs = {(r["key"], r["step"], r["state"]): r["cost"] for r in rows}
    paths = {
        (r["key"], r["step"]): r["state"] for r in rows if r["on_path"]
    }
    return costs, paths


def _modular_instance(n_keys=5, n_steps=6, n_states=4):
    em = {
        (k, s, st): (k * 7 + s * 11 + st * 13) % 101
        for k in range(n_keys) for s in range(n_steps) for st in range(n_states)
    }
    tr = {
        (a, b): (a * 31 + b * 17) % 59 + (0 if a == b else 23)
        for a in range(n_states) for b in range(n_states)
    }
    return em, tr


def test_dense_matrix_matches_reference(spark):
    em, tr = _modular_instance()
    assert _run(spark, em, trans=tr) == _ref(em, trans=tr)


def test_switch_model_matches_reference(spark):
    em, _ = _modular_instance(n_keys=4, n_steps=5, n_states=6)
    assert _run(spark, em, lam=40) == _ref(em, lam=40)


def test_sparse_candidates_and_step_gaps(spark):
    # ragged candidate sets, non-contiguous steps
    em = {
        (0, 0, 2): 5, (0, 0, 7): 1,
        (0, 3, 2): 4,
        (0, 9, 1): 0, (0, 9, 2): 2,
    }
    assert _run(spark, em, lam=10) == _ref(em, lam=10)


def test_forbidden_transitions_drop_unreachable(spark):
    # state 1 at step 1 is unreachable (no inbound transitions)
    em = {(0, 0, 0): 1, (0, 1, 0): 1, (0, 1, 1): 0}
    tr = {(0, 0): 2, (1, 1): 0, (1, 0): 0}
    costs, paths = _run(spark, em, trans=tr)
    assert costs == {(0, 0, 0): 1, (0, 1, 0): 4}
    assert paths == {(0, 0): 0, (0, 1): 0}


def test_broken_chain_restarts(spark):
    # step 1 fully unreachable: chain restarts, path covers the tail only
    em = {(0, 0, 0): 3, (0, 1, 1): 5, (0, 2, 1): 7}
    tr = {(0, 0): 0, (1, 1): 1}
    costs, paths = _run(spark, em, trans=tr)
    # step1 state1 unreachable from {0} -> dropped; chain restarts at step2
    assert costs == {(0, 0, 0): 3, (0, 2, 1): 7}
    assert paths == {(0, 2): 1}


def test_path_tie_breaks_to_min_state(spark):
    # two equal-cost paths; both final states cost 2 -> pick state 0,
    # predecessors tie -> pick min state
    em = {(0, 0, 0): 1, (0, 0, 1): 1, (0, 1, 0): 1, (0, 1, 1): 1}
    costs, paths = _run(spark, em, lam=0)
    assert costs == {(0, 0, 0): 1, (0, 0, 1): 1, (0, 1, 0): 2, (0, 1, 1): 2}
    assert paths == {(0, 0): 0, (0, 1): 0}
    ref = _ref(em, lam=0)
    assert (costs, paths) == ref


def test_many_keys_span_arrow_batches(spark):
    # r6 optimization: decoding now streams many keys per mapInPandas
    # batch with carry-over when a key spans an Arrow batch boundary —
    # force tiny batches so every trellis crosses one.
    import random

    rnd = random.Random(9)
    emissions = {}
    for k in range(40):
        for s in range(6):
            for st in rnd.sample(range(5), rnd.randint(1, 4)):
                emissions[(k, s, st)] = rnd.randint(0, 50)
    rows = [(k, s, st, e) for (k, s, st), e in emissions.items()]
    df = spark.createDataFrame(
        rows, "key long, step long, state long, e_cost long"
    )
    lam = 7
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        got = {
            (r.key, r.step, r.state): (r.cost, r.on_path)
            for r in viterbi_costs(df, switch_cost=lam).collect()
        }
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    costs, paths = _ref(emissions, lam=lam)
    assert {k: v[0] for k, v in got.items()} == costs
    on = {(k, s, st) for (k, s, st), (_, p) in got.items() if p}
    want_on = {(k, s, st) for (k, s), st in paths.items()}
    assert on == want_on

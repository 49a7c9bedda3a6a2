"""pregel_pagerank vs a direct NumPy implementation of the reference
program (pregel_pagerank.hpp:95-135): score init 1, update
α + (1−α)·incoming, per-vertex tolerance, monotone-shrinking active set
(localConverge) or all-vote-to-halt termination."""

import numpy as np

from alp_ray.pipelines.pregel_algorithms import pregel_pagerank
from alp_ray.state.engine import GraphEngine


def _oracle(src, dst, n, alpha=0.15, tol=1e-5, max_rounds=1000,
            local_converge=True):
    outdeg = np.bincount(src, minlength=n).astype(float)
    score = np.ones(n)
    active = np.ones(n, bool)
    for rnd in range(max_rounds):
        # Broadcast: active vertices with outdeg>0 send score/outdeg.
        incoming = np.zeros(n)
        for s, d in zip(src, dst):
            if active[s] and outdeg[s] > 0:
                incoming[d] += score[s] / outdeg[s]
        # Next round's compute over the active set only.
        old = score.copy()
        score = np.where(active, alpha + (1 - alpha) * incoming, old)
        conv = active & (np.abs(score - old) < tol)
        if local_converge:
            active = active & ~conv
            if not active.any():
                break
        else:
            if (~active | conv).all():
                break
    return score


def _graph(seed=41, n=60, m=240):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx], n


def test_pregel_pagerank_local_converge():
    src, dst, n = _graph()
    engine = GraphEngine.from_arrays(src, dst, n=n, P=3)
    res = pregel_pagerank(engine, local_converge=True)
    score = engine.get_state_by_vertex("score")
    engine.shutdown()
    assert res.converged
    want = _oracle(src, dst, n, local_converge=True)
    np.testing.assert_allclose(score, want, atol=1e-9)


def test_pregel_pagerank_vote_to_halt():
    src, dst, n = _graph(seed=43)
    engine = GraphEngine.from_arrays(src, dst, n=n, P=3)
    res = pregel_pagerank(engine, local_converge=False)
    score = engine.get_state_by_vertex("score")
    engine.shutdown()
    assert res.converged
    want = _oracle(src, dst, n, local_converge=False)
    np.testing.assert_allclose(score, want, atol=1e-9)


def test_out_sparsify_strategies_identical():
    """The four ALP SparsificationStrategy knobs (pregel.hpp:167-242)
    are physical forms only: same rounds, same convergence, scores
    equal to ≤ a few ulp. (Not bitwise: the dense exchange sums longer
    per-segment vectors — identity terms interleaved — and numpy's
    pairwise-summation tree reshapes for segments ≥ 8 terms, exactly
    as ALP's own sparse-vs-dense fold structure differs per strategy.
    WITHIN a strategy the engine stays bitwise deterministic.)"""
    src, dst, n = _graph(seed=47)
    scores = {}
    rounds = {}
    for strat in ("always", "none", "when_reduced", "when_halved"):
        engine = GraphEngine.from_arrays(src, dst, n=n, P=3)
        res = pregel_pagerank(
            engine, local_converge=True, out_sparsify=strat
        )
        scores[strat] = engine.get_state_by_vertex("score")
        rounds[strat] = res.rounds
        engine.shutdown()
        assert res.converged
    for strat in ("none", "when_reduced", "when_halved"):
        assert rounds[strat] == rounds["always"]
        np.testing.assert_allclose(
            scores[strat], scores["always"], rtol=0, atol=1e-12
        )

"""Deterministic random walks vs a sequential numpy oracle."""

import numpy as np
import pyarrow as pa

import ray.data

from alp_ray.pipelines.walks import _mix, random_walks


def test_walks_match_sequential_oracle():
    rng = np.random.RandomState(13)
    n, m = 60, 250
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    # Leave some vertices dangling.
    keep = src < 50
    src, dst = src[keep], dst[keep]
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    out = random_walks(ds, n=n, steps=3).to_pandas()
    got = {
        (r.walk_id, r.step): r.vertex for r in out.itertuples()
    }
    # Sequential oracle.
    adj = [sorted(dst[src == v].tolist()) for v in range(n)]
    for w in range(n):
        cur = w
        assert got[(w, 0)] == w
        for t in range(1, 4):
            nb = adj[cur]
            if nb:
                cur = nb[
                    int(_mix(np.array([w]), t, np.array([cur]))[0])
                    % len(nb)
                ]
            assert got[(w, t)] == cur, (w, t)
    assert len(out) == n * 4

"""Join-cardinality HLL sketch: inclusion-exclusion estimate accuracy
and merge (union = register max) correctness."""

import numpy as np
import pyarrow as pa


def _est(regs, m):
    z = (2.0 ** -regs.astype(np.float64)).sum()
    e = 0.709 * m * m / z  # alpha_64
    zero = (regs == 0).sum()
    if e <= 2.5 * m and zero > 0:
        e = m * np.log(m / zero)
    return e


def test_join_cardinality_inclusion_exclusion(ray_session):
    import ray.data

    from alp_ray.stages.sketch import hll_int_registers

    rng = np.random.default_rng(2)
    a = rng.choice(200_000, 3000, replace=False).astype(np.int64)
    b = np.concatenate([a[:1200], 200_000 + np.arange(2000)])
    da = ray.data.from_arrow(pa.table({"k": pa.array(a)}))
    db = ray.data.from_arrow(
        pa.table({"k": pa.array(b.astype(np.int64))})
    )
    m = 64
    ra = hll_int_registers(da, "k", p=6)
    rb = hll_int_registers(db, "k", p=6)
    ru = np.maximum(ra, rb)
    ea, eb, eu = _est(ra, m), _est(rb, m), _est(ru, m)
    inter_est = ea + eb - eu
    # exact: |A|=3000, |B|=3200, |A∩B|=1200, |A∪B|=5000
    assert abs(ea - 3000) / 3000 < 0.35
    assert abs(eu - 5000) / 5000 < 0.35
    # intersection is a difference of estimates — looser bound.
    assert abs(inter_est - 1200) < 1200
    # Union registers dominate both sides (mergeability).
    assert (ru >= ra).all() and (ru >= rb).all()

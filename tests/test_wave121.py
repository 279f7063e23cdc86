"""Brute twin for wave 121: structural twin-vertex census."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_twin_census_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    nbrs: dict[int, list] = {}
    for a, b in zip(us.tolist(), ud.tolist()):
        nbrs.setdefault(a, []).append(b)
    classes: dict[tuple, int] = {}
    for _v, vs in nbrs.items():
        key = tuple(sorted(vs))
        classes[key] = classes.get(key, 0) + 1
    exp: dict[int, int] = {}
    for c in classes.values():
        exp[c] = exp.get(c, 0) + 1

    got = q.q_twin_census(SF).to_pandas()
    assert {int(r.class_size): int(r.n_classes)
            for _, r in got.iterrows()} == exp
    # every deg>=1 vertex lands in exactly one class
    assert int((got.class_size * got.n_classes).sum()) == len(nbrs)


def test_twin_kernels_detect_twins(ray_session):
    """Hand-built star-with-twins: leaves of the same hub are twins —
    the multi-class face the corpus (1-row census) cannot exercise."""
    import pyarrow as pa

    from combblas_ray.pipelines import queries as q

    # hub 0 with leaves 1..4 (all twins: nbrs == {0}); path 5-6-7
    und = [(0, i) for i in range(1, 5)] + [(5, 6), (6, 7)]
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    j = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    sigs = q._w121_sig(j)
    hist = q._w121_cls(sigs)
    got = {int(a.as_py()): int(b.as_py())
           for a, b in zip(hist.column("class_size"),
                           hist.column("n_classes"))}
    # classes: {1,2,3,4} (nbr {0}), {5,7} (nbr {6}), {0}, {6}
    assert got == {4: 1, 2: 1, 1: 2}

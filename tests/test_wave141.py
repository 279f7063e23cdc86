"""Brute twin for wave 141: Benjamini-Hochberg FDR selection.

Textbook BH: sort ALL p-values, walk k = m..1 for the largest k with
p_(k) <= alpha*k/m (Fraction-exact, no integer-grid shortcut), select
p <= p_(k*). Agreement proves the histogram/cumsum formulation.
"""

from fractions import Fraction

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_fdr_select_vs_textbook_bh(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    did = docs["doc_id"].to_numpy(dtype=np.int64)
    p_int = q._fdr_p_int(did)
    m = len(p_int)
    alpha = Fraction(1, q.FDR_ALPHA_DEN)

    ps = np.sort(p_int)
    k_star, thr = 0, -1
    for k in range(m, 0, -1):
        if Fraction(int(ps[k - 1]), q.FDR_M) <= alpha * k / m:
            k_star, thr = k, int(ps[k - 1])
            break

    sel = p_int <= thr
    exp = {}
    for lang in sorted(set(docs["lang"])):
        mask = (docs["lang"] == lang).to_numpy()
        exp[lang] = (int(mask.sum()), int(sel[mask].sum()))

    got = q.q_fdr_select(SF).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (int(r.n_docs), int(r.n_selected)) == exp[r.lang]
        assert (int(r.k_star), int(r.thr)) == (k_star, thr)
    # discriminative: the signal plant must make BH select something,
    # but far fewer than everything
    assert 0 < int(got.n_selected.sum()) < m
    # selected count equals k_star by the BH step-up construction
    assert int(got.n_selected.sum()) == k_star

"""Brute twin for wave 165: exact diversity indices — Fraction check
that the integer channel really encodes Gini-Simpson."""

from fractions import Fraction

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_diversity_index_vs_fractions(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "lang"]).to_pandas()
    got = q.q_diversity_index(SF).to_pandas()
    assert len(got) == docs["source"].nunique()
    for _, r in got.iterrows():
        grp = docs[docs["source"] == r.source]["lang"].value_counts()
        n = int(grp.sum())
        num = sum(int(c) * (int(c) - 1) for c in grp)
        assert (int(r.n_docs), int(r.simpson_num),
                int(r.simpson_den), int(r.berger_max)) == \
            (n, num, n * (n - 1), int(grp.max()))
        # the encoded rational is the textbook collision probability
        d = Fraction(num, n * (n - 1))
        assert 0 <= d <= 1
        # dominance bound: Berger-Parker share^2 <= Simpson collision
        assert Fraction(int(grp.max()), n) ** 2 <= d + Fraction(1, n)

"""Tests for interrater analysis (Dawid-Skene EM, Krippendorff alpha,
constrained clustering) — NuCLS subtree capability."""

import numpy as np
import pytest

from nuhtc_tpu.eval.interrater import (
    ConstrainedAgglomerativeClustering,
    DawidSkeneEM,
    krippendorff_alpha,
    truth_from_posteriors,
)


def _alpha_pairwise_oracle(rows, delta_fn, domain):
    """Independent O(n²) coincidence-matrix construction: loop over ordered
    rating pairs within each unit, weight 1/(m_u − 1)."""
    nv = len(domain)
    vidx = {v: i for i, v in enumerate(domain)}
    n_units = max(len(r) for r in rows)
    o = np.zeros((nv, nv))
    for u in range(n_units):
        vals = [r[u] for r in rows if u < len(r) and r[u] is not None]
        m = len(vals)
        if m < 2:
            continue
        for a in range(m):
            for b in range(m):
                if a != b:
                    o[vidx[vals[a]], vidx[vals[b]]] += 1.0 / (m - 1)
    nc = o.sum(axis=1)
    n = o.sum()
    delta = np.array([[delta_fn(i, j, nc) for j in range(nv)] for i in range(nv)])
    d_o = (o * delta).sum()
    e = np.outer(nc, nc) - np.diag(nc)
    d_e = (e * delta).sum() / (n - 1)
    return 1.0 - d_o / d_e if d_e else 1.0


CANONICAL = [
    [None, None, None, None, None, 3, 4, 1, 2, 1, 1, 3, 3, None, 3],
    [1, None, 2, 1, 3, 3, 4, 3, None, None, None, None, None, None, None],
    [None, None, 2, 1, 3, 4, 4, None, 2, 1, 1, 3, 3, None, 4],
]


def test_alpha_canonical_nominal_interval():
    """The worked example from Krippendorff (2011) used by the public
    `krippendorff` package: nominal α ≈ 0.691, interval α ≈ 0.811."""
    a_nom = krippendorff_alpha(CANONICAL, "nominal")
    a_int = krippendorff_alpha(CANONICAL, "interval")
    assert abs(a_nom - 0.691) < 0.005, a_nom
    assert abs(a_int - 0.811) < 0.005, a_int


def test_alpha_perfect_and_poor():
    perfect = [[1, 2, 3, 1, 2], [1, 2, 3, 1, 2], [1, 2, 3, 1, 2]]
    assert krippendorff_alpha(perfect, "nominal") == pytest.approx(1.0)
    rng = np.random.RandomState(0)
    random_data = rng.randint(0, 5, (4, 400)).tolist()
    assert abs(krippendorff_alpha(random_data, "nominal")) < 0.08


def test_alpha_matches_pairwise_oracle_nominal():
    rng = np.random.RandomState(1)
    rows = rng.randint(0, 4, (3, 40)).astype(object)
    rows[rng.rand(3, 40) < 0.2] = None  # missing
    rows = rows.tolist()
    domain = [0, 1, 2, 3]
    got = krippendorff_alpha(rows, "nominal", value_domain=domain)
    want = _alpha_pairwise_oracle(
        rows, lambda i, j, nc: float(i != j), domain
    )
    assert got == pytest.approx(want, abs=1e-10)


def test_alpha_matches_pairwise_oracle_interval():
    rng = np.random.RandomState(2)
    rows = rng.randint(1, 6, (4, 30)).astype(object)
    rows[rng.rand(4, 30) < 0.15] = None
    rows = rows.tolist()
    domain = [1, 2, 3, 4, 5]
    got = krippendorff_alpha(rows, "interval", value_domain=domain)
    want = _alpha_pairwise_oracle(
        rows, lambda i, j, nc: float((domain[i] - domain[j]) ** 2), domain
    )
    assert got == pytest.approx(want, abs=1e-10)


def test_dawid_skene_recovers_planted_truth():
    rng = np.random.RandomState(3)
    k, n_items, n_workers = 3, 300, 6
    truth = rng.randint(0, k, n_items)
    acc = [0.85] * 5 + [0.25]  # five good workers, one near-adversarial
    responses = {}
    for e in range(n_items):
        responses[e] = {}
        for w in range(n_workers):
            if rng.rand() < acc[w]:
                responses[e][w] = int(truth[e])
            else:
                responses[e][w] = int((truth[e] + 1 + rng.randint(k - 1)) % k)

    em = DawidSkeneEM(responses, label_set=list(range(k)))
    e2lpd, cm, priors = em.run(n_iter=30)
    pred = truth_from_posteriors(e2lpd)
    acc_em = np.mean([pred[e] == truth[e] for e in range(n_items)])
    assert acc_em > 0.93

    # learned confusion: good workers near-diagonal, bad worker not
    diag_good = np.mean([np.trace(cm[w]) / 3 for w in range(5)])
    diag_bad = np.trace(cm[5]) / 3
    assert diag_good > 0.75 > diag_bad


def test_constrained_clustering_respects_rater_constraint():
    rng = np.random.RandomState(4)
    centers = np.array([[10.0, 10.0], [40.0, 12.0], [25.0, 40.0]])
    pts, raters = [], []
    for c in range(3):
        for r in range(3):  # three raters each click every nucleus once
            pts.append(centers[c] + rng.randn(2))
            raters.append(r)
    pts = np.array(pts)
    cl = ConstrainedAgglomerativeClustering(pts, raters, linkage_thresh=10.0)
    clusters = cl.run()
    assert len(clusters) == 3
    for c in clusters:
        rs = [raters[i] for i in c]
        assert len(rs) == len(set(rs))  # no duplicate rater in a cluster
    med = cl.medoids(clusters)
    d = np.linalg.norm(med[:, None] - centers[None], axis=-1).min(axis=1)
    assert (d < 2.5).all()

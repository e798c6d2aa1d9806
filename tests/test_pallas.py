"""Pallas lattice-scan kernel vs a numpy reference (interpreter mode on the
CPU backend; the same kernel compiles via Mosaic on TPU — verified
out-of-band on hardware for both modes)."""

import numpy as np
import pytest


NEG_INF = -1e30


def _ref_alpha(sc, mode):
    W, P, K = sc.shape
    alpha = np.full((W, P + 1), NEG_INF, np.float64)
    alpha[:, 0] = 0.0
    for p in range(P):
        cand = np.full((W, K), -np.inf)
        for k in range(K):
            if p - k >= 0:
                cand[:, k] = alpha[:, p - k] + sc[:, p, k]
        m = cand.max(axis=1)
        if mode == "viterbi":
            alpha[:, p + 1] = np.maximum(m, NEG_INF)
        else:
            e = np.where(cand - m[:, None] > -60,
                         np.exp(np.clip(cand - m[:, None], -700, 0)), 0)
            alpha[:, p + 1] = np.where(m <= NEG_INF / 2, NEG_INF,
                                       m + np.log(e.sum(axis=1)))
    return alpha


@pytest.mark.parametrize("mode", ["viterbi", "logsumexp"])
def test_lattice_scan_kernel(mode):
    import jax.numpy as jnp
    from sentencepiece_tpu.tpu.pallas_kernels import lattice_scan_pallas

    rng = np.random.default_rng(0)
    W, P, K = 200, 24, 6
    sc = rng.normal(-3, 1, (W, P, K)).astype(np.float32)
    sc[rng.random((W, P, K)) < 0.4] = NEG_INF
    got = np.asarray(lattice_scan_pallas(jnp.asarray(sc), mode=mode,
                                         interpret=True))
    want = _ref_alpha(sc, mode)
    finite = want > NEG_INF / 2
    assert ((got <= NEG_INF / 2) == ~finite).all()
    assert np.allclose(got[finite], want[finite], atol=1e-3)

"""Real-TPU numeric check + block-size sweep for the fused JMLE kernel.

python benchmarks/jmle_kernel_check.py          # correctness vs XLA path
"""
from __future__ import annotations

import os
import sys
import numpy as np

import _common
_common.setup()



def check():
    import jax.numpy as jnp
    from dashing_tpu.ops import pairwise as pw
    from dashing_tpu.sketch import estimators as est
    rng = np.random.default_rng(0)
    p, kmin, K = 14, 6, 14
    kmax = kmin + K - 1
    a = rng.integers(kmin, kmax, size=(96, 1 << p)).astype(np.int32)
    b = rng.integers(kmin, kmax, size=(200, 1 << p)).astype(np.int32)
    stats = pw.pair_stats(jnp.asarray(a), jnp.asarray(b), kmax, True, kmin)
    os.environ["DASHING_TPU_PALLAS_JMLE"] = "0"
    want = np.asarray(pw.triples_from_stats(stats, p, est.ERTL_MLE,
                                            est.ERTL_JOINT_MLE, kmin))
    os.environ["DASHING_TPU_PALLAS_JMLE"] = "1"
    got = np.asarray(pw._pallas_jmle_triples(stats, p, kmin))
    ji_w = want[..., 2] / np.maximum(want.sum(-1), 1e-30)
    ji_g = got[..., 2] / np.maximum(got.sum(-1), 1e-30)
    print("max |dJI|:", float(np.abs(ji_g - ji_w).max()))
    print("max rel tri:", float((np.abs(got - want)
                                 / np.maximum(np.abs(want), 1.0)).max()))
    assert np.abs(ji_g - ji_w).max() < 1e-5
    print("TPU kernel vs XLA path: OK")


if __name__ == "__main__":
    check()

"""CI-grade estimator accuracy regression (ADVICE r2 item 1).

The joint MLE runs a fixed 10 blind Newton steps with only a final
likelihood guard — a silent-accuracy risk class if a refactor degrades the
trajectory.  The full sweep (benchmarks/estimator_sweep.py, 30 trials,
p in {10,14,18}) stays the measurement of record; this fixed-seed
mini-sweep pins the p=14 numbers in CI so a regression fails loudly.

Recorded sweep values (BENCH_NOTES): JMLE Jaccard RMSE at p=14 = 0.0034
(incl-excl: 0.0058); MLE cardinality relative RMSE at p=14 ~ the 1.04/
sqrt(m) = 0.0081 HLL bound.  Thresholds below leave ~50% headroom over
the deterministic fixed-seed values, far under the broken-estimator
failure modes (IE-level 0.006+, or divergence >0.05).
"""
import numpy as np

from dashing_tpu.sketch import estimators as est
from dashing_tpu.sketch.hll import HLL

TRIALS = 8
P = 14


def test_jmle_jaccard_rmse_pinned():
    rng = np.random.default_rng(1234)
    errs = []
    for _ in range(TRIALS):
        n = 30_000
        shared = rng.integers(0, 2**62, n, dtype=np.uint64)
        a = HLL(P, jestim=est.ERTL_JOINT_MLE)
        b = HLL(P, jestim=est.ERTL_JOINT_MLE)
        a.addh_np(np.concatenate(
            [shared, rng.integers(2**62, 2**63, n, dtype=np.uint64)]))
        b.addh_np(np.concatenate(
            [shared, rng.integers(2**63, 2**64 - 1, n, dtype=np.uint64)]))
        errs.append(a.jaccard_index(b) - 1.0 / 3.0)
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # fixed-seed deterministic; recorded 30-trial sweep value 0.0034
    assert rmse < 0.005, rmse


def test_mle_cardinality_rmse_pinned():
    rng = np.random.default_rng(99)
    errs = []
    for _ in range(TRIALS):
        n = 100_000
        h = HLL(P)
        h.addh_np(rng.integers(0, 2**63, n, dtype=np.uint64))
        errs.append(h.report() / n - 1.0)
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # HLL theoretical sigma at p=14 is 1.04/sqrt(2^14) = 0.0081
    assert rmse < 0.012, rmse

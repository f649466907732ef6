"""Host-tiled all-pairs throughput at scale (the production compare path).

Unlike allpairs_bench.py (single in-jit tile, on-device truth), this runs
the REAL orchestration: registers uploaded once as int8, device-side tile
slices, async dispatch window, condensed writeback — everything `dist`
does, so tunnel/PCIe transfer is included.

    python benchmarks/tiled_scale.py [n] [p] [tile]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

import _common
_common.setup()



def main(n: int = 4096, p: int = 14, tile: int = 1024):
    from dashing_tpu.ops import pairwise as pw
    from dashing_tpu.sketch import estimators as est
    from dashing_tpu.sketch.hll import HLL

    rng = np.random.default_rng(0)
    lam = 5e6 / (1 << p)
    regs = np.minimum(
        rng.geometric(0.5, size=(n, 1 << p)) - 1 +
        np.maximum(np.log2(lam), 0).astype(np.int64),
        64 - p + 1).astype(np.uint8)
    sketches = [HLL(p, regs=regs[i]) for i in range(n)]
    # compile/warm on a prefix
    _ = pw.all_pairs_condensed(sketches[:min(2 * tile, n)], pw.JI, 21,
                               est.ERTL_MLE, est.ERTL_MLE, tile=tile)
    t0 = time.perf_counter()
    _ = pw.all_pairs_condensed(sketches, pw.JI, 21, est.ERTL_MLE,
                               est.ERTL_MLE, tile=tile)
    dt = time.perf_counter() - t0
    pairs = n * (n - 1) / 2
    print(f"tiled all-pairs n={n} p={p} tile={tile}: {dt:.2f} s -> "
          f"{pairs / dt / 1e6:.2f} M pairs/s (incl. transfers)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

"""Text-emission throughput: native C++ row formatter vs the Python loop.

python benchmarks/emit_bench.py        # CPU-only, no device involved

The emitters are byte-format compatibility surfaces (reference
src/sketch_and_cmp.h:16-35); this measures host formatting only, the e2e
bottleneck for TSV output once compares run at 23.5M pairs/s on device.
"""
from __future__ import annotations

import io
import os
import sys
import time

import numpy as np

import _common
_common.setup(default_platform='cpu')


def run(n: int = 4096):
    from dashing_tpu.io import distmat, native

    rng = np.random.default_rng(0)
    cond = rng.random(n * (n - 1) // 2).astype(np.float32)
    names = [f"g{i}" for i in range(n)]
    for label, force_py in (("native", False), ("python", True)):
        if force_py:
            saved = native.fmt_rows_iter
            native.fmt_rows_iter = lambda *a, **k: None
        try:
            buf = io.StringIO()
            t0 = time.perf_counter()
            distmat.emit_ut_tsv(buf, names, cond)
            dt = time.perf_counter() - t0
        finally:
            if force_py:
                native.fmt_rows_iter = saved
        print(f"emit_ut_tsv [{label:6s}] n={n}: "
              f"{cond.size / dt / 1e6:6.2f} M vals/s  ({dt:.2f}s)")


def run_rect(nq: int = 1024, nr: int = 16384):
    """Q x R TSV emission (the 1k-query x 100k-ref containment screen
    wall; routed through emit_rect_tsv since round 4)."""
    from dashing_tpu.io import distmat, native

    rng = np.random.default_rng(0)
    mat = rng.random((nq, nr)).astype(np.float32)
    qnames = [f"q{i}" for i in range(nq)]
    for label, force_py in (("native", False), ("python", True)):
        if force_py:
            saved = native.fmt_rows_iter
            native.fmt_rows_iter = lambda *a, **k: None
        try:
            buf = io.StringIO()
            t0 = time.perf_counter()
            distmat.emit_rect_tsv(buf, qnames, mat)
            dt = time.perf_counter() - t0
        finally:
            if force_py:
                native.fmt_rows_iter = saved
        print(f"emit_rect_tsv [{label:6s}] {nq}x{nr}: "
              f"{mat.size / dt / 1e6:6.2f} M vals/s  ({dt:.2f}s)")


def run_nn(npairs: int = 65536, nn: int = 16):
    from dashing_tpu.io import distmat, native

    rng = np.random.default_rng(0)
    vals = rng.random((npairs, nn)).astype(np.float32)
    order = rng.integers(0, npairs, size=(npairs, nn)).astype(np.int64)
    names = [f"g{i}" for i in range(npairs)]
    for label, force_py in (("native", False), ("python", True)):
        if force_py:
            saved = native.fmt_rows_iter
            saved_nn = native.fmt_nn_rows_iter
            native.fmt_rows_iter = lambda *a, **k: None
            native.fmt_nn_rows_iter = lambda *a, **k: None
        try:
            buf = io.StringIO()
            t0 = time.perf_counter()
            distmat.emit_nn_tsv(buf, names, vals, order)
            dt = time.perf_counter() - t0
        finally:
            if force_py:
                native.fmt_rows_iter = saved
                native.fmt_nn_rows_iter = saved_nn
        print(f"emit_nn_tsv [{label:6s}] {npairs}x{nn}: "
              f"{vals.size / dt / 1e6:6.2f} M vals/s  ({dt:.2f}s)")


if __name__ == "__main__":
    run()
    run_rect()
    run_nn()

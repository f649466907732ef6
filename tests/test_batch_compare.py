"""Batched non-HLL compare engines must reproduce the per-pair
full_set_comparison triples (VERDICT r1 item 5)."""
import numpy as np
import pytest

from dashing_tpu.sketch import batch_compare
from dashing_tpu.sketch.extra import DensifiedMinHash, HyperMinHash
from dashing_tpu.sketch.setsketches import (BBitMinHash, BloomFilter,
                                            BottomK, CountingBottomK)


def _mk(cls, kwargs, rng, n=9, base_n=4000):
    base = rng.integers(0, 2**62, base_n, dtype=np.uint64)
    out = []
    for i in range(n):
        s = cls(**kwargs)
        if i == n - 1:
            vals = rng.integers(0, 2**62, 7, dtype=np.uint64)  # near-empty
        else:
            vals = np.concatenate(
                [base[: 1000 + 300 * i],
                 rng.integers(0, 2**62, 200 * i + 50, dtype=np.uint64)])
        if cls is CountingBottomK:
            # multiplicities: repeat a slice so counts exceed 1
            vals = np.concatenate([vals, vals[: vals.size // 3]])
        s.addh_np(vals)
        s.finalize()
        out.append(s)
    return out


@pytest.mark.parametrize("cls,kwargs", [
    (BBitMinHash, dict(p=8, b=16)),
    (DensifiedMinHash, dict(p=8, b=16)),
    (HyperMinHash, dict(p=8, regwidth=16)),
    (BloomFilter, dict(nbits_log2=13, nhashes=2)),
    (BottomK, dict(kk=128)),
    (CountingBottomK, dict(kk=96)),
])
def test_batch_matches_perpair(rng, cls, kwargs):
    sketches = _mk(cls, kwargs, rng)
    n = len(sketches)
    rect = batch_compare.batch_triples(sketches, sketches)
    assert rect is not None and rect.shape == (n, n, 3)
    for i in range(n):
        for j in range(n):
            want = np.asarray(sketches[i].full_set_comparison(sketches[j]),
                              np.float64)
            np.testing.assert_allclose(
                rect[i, j], want, rtol=1e-12, atol=1e-9,
                err_msg=f"{cls.__name__} pair ({i},{j})")


def test_batch_rect_asymmetric(rng):
    A = _mk(BBitMinHash, dict(p=8, b=16), rng, n=5)
    B = _mk(BBitMinHash, dict(p=8, b=16), rng, n=3)
    rect = batch_compare.batch_triples(A, B)
    assert rect.shape == (5, 3, 3)
    for i in range(5):
        for j in range(3):
            np.testing.assert_allclose(
                rect[i, j],
                np.asarray(A[i].full_set_comparison(B[j]), np.float64),
                rtol=1e-12, atol=1e-9)


def test_cli_bbmh_dist_uses_batch(tmp_path, rng, capsys):
    """End-to-end: -8 (bbmh) dist output stays correct via the batch path."""
    from dashing_tpu.cli import main as climain
    base = "".join(rng.choice(list("ACGT"), size=6000))
    paths = []
    for i, rate in enumerate([0, 0.03, 0.15]):
        s = list(base)
        idx = rng.choice(len(s), size=int(rate * len(s)), replace=False)
        for t in idx:
            s[t] = rng.choice([c for c in "ACGT" if c != s[t]])
        p = tmp_path / f"b{i}.fa"
        p.write_text(f">b{i}\n{''.join(s)}\n")
        paths.append(str(p))
    assert climain.main(["dist", "-k", "21", "-S", "12", "-8",
                         "--avoid-sorting"] + paths) == 0
    out = capsys.readouterr().out
    rows = [l.split("\t") for l in out.splitlines() if l.endswith("fa")
            or "\t-\t" in l]
    # closer genome pair must score higher JI than the farther pair
    vals = [l.split("\t") for l in out.splitlines()][-3:]
    ji01 = float(vals[0][2])
    ji02 = float(vals[0][3])
    assert ji01 > ji02 > 0.0


def test_cli_union_sniffed_bbmh(tmp_path, rng, capsys):
    """union with auto-sniffed (non-HLL) inputs must not take the HLL mesh
    branch (review r2: it crashed on .regs / corrupted HMH registers)."""
    from dashing_tpu.cli import main as climain
    from dashing_tpu.sketch.setsketches import BBitMinHash
    paths = []
    vals = [rng.integers(0, 2**62, 3000, dtype=np.uint64) for _ in range(3)]
    for i, v in enumerate(vals):
        s = BBitMinHash(p=7, b=16)
        s.add_np(v)
        s.finalize()
        p = str(tmp_path / f"u{i}.bmh")
        s.write(p)
        paths.append(p)
    out = str(tmp_path / "u.bmh")
    assert climain.main(["union", "-o", out] + paths) == 0
    capsys.readouterr()
    got = BBitMinHash.read(out)
    want = np.full_like(got.mins, BBitMinHash.EMPTY)
    for v in vals:
        s = BBitMinHash(p=7, b=16)
        s.add_np(v)
        want = np.minimum(want, s.mins)
    np.testing.assert_array_equal(got.mins, want)


def test_cli_nn_bbmh_uses_batch_rect(tmp_path, rng, capsys):
    """k-NN with a minhash type goes through the batched rect engine."""
    from dashing_tpu.cli import main as climain
    base = "".join(rng.choice(list("ACGT"), size=5000))
    paths = []
    for i, rate in enumerate([0, 0.02, 0.10, 0.25]):
        s = list(base)
        idx = rng.choice(len(s), size=int(rate * len(s)), replace=False)
        for t in idx:
            s[t] = rng.choice([c for c in "ACGT" if c != s[t]])
        p = tmp_path / f"n{i}.fa"
        p.write_text(f">n{i}\n{''.join(s)}\n")
        paths.append(str(p))
    assert climain.main(["dist", "-k", "21", "-S", "12", "-8",
                         "--nearest-neighbors", "2", "--avoid-sorting"]
                        + paths) == 0
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines()
            if l.split("\t")[0].endswith(".fa") and ":" in l.split("\t")[-1]]
    assert len(rows) == 4
    # nearest neighbor of genome 0 must be genome 1 (2% mutated)
    first = rows[0].split("\t")[1]
    assert first.startswith("1:")


def test_superminhash_state_bounded(rng):
    """The Fisher-Yates scratch must stay bounded at large m (review r2:
    a fixed 65536-row chunk OOMed at -S 16)."""
    from dashing_tpu.sketch.extra import SuperMinHash
    s = SuperMinHash(p=15)
    s.add_np(rng.integers(0, 2**62, 50_000, dtype=np.uint64))
    perm, gen, _ = s._gen_state
    assert perm.shape[0] * perm.shape[1] * 8 <= 300 << 20
    assert np.isfinite(s.h).all()


def test_host_nn_topk_matches_dense(rng):
    """Streaming non-HLL k-NN (tiled batched triples + bounded merge) must
    reproduce the dense full-matrix argsort exactly, incl. tie-break by
    ascending ref index and self-exclusion (VERDICT r2 item 6)."""
    from dashing_tpu.cli import core
    from dashing_tpu.ops import pairwise as pw
    from dashing_tpu.sketch import estimators as est
    from dashing_tpu.sketch.setsketches import BBitMinHash
    n, nn = 30, 4
    base = rng.integers(0, 2**62, 4000, dtype=np.uint64)
    sketches = []
    for i in range(n):
        s = BBitMinHash(p=6, b=16)
        s.addh_np(np.concatenate(
            [base[: 2000 + 31 * i],
             rng.integers(0, 2**62, 300 + 7 * i, dtype=np.uint64)]))
        s.finalize()
        sketches.append(s)
    for result_type in (pw.JI, pw.MASH_DIST):
        sim = pw.is_similarity(result_type)
        mat = core.compare_rect(sketches, sketches, result_type, 21,
                                est.ERTL_MLE, est.ERTL_MLE)
        for i in range(n):
            mat[i, i] = -np.inf if sim else np.inf
        order = np.argsort(-mat if sim else mat, axis=1,
                           kind="stable")[:, :nn]
        vals = np.take_along_axis(mat, order, axis=1)
        sv, si = core.host_nn_topk(sketches, sketches, result_type, 21,
                                   est.ERTL_MLE, est.ERTL_MLE, nn,
                                   exclude_self=True, tile=7)
        np.testing.assert_array_equal(si, order)
        np.testing.assert_array_equal(sv, vals)

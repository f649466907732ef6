"""Golden regression tests: outputs must stay byte-stable across rounds.

Fixtures in tests/golden/ were produced by the CLI itself (round 1) on three
synthetic genomes; any change to encoding, hashing, estimators, formats, or
formatting shows up here as a byte diff.
"""
import os

import pytest

from dashing_tpu.cli import main as climain
from dashing_tpu.sketch.hll import HLL

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture()
def in_golden(monkeypatch, tmp_path):
    # run in a temp dir with the genomes copied in, so cache files etc.
    # don't pollute the fixture directory
    import shutil
    for i in range(3):
        shutil.copy(os.path.join(GOLDEN, f"g{i}.fa"), tmp_path / f"g{i}.fa")
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_golden_dist_tsv(in_golden, capsys):
    rc = climain.main(["dist", "-k", "21", "-S", "12", "--avoid-sorting",
                       "g0.fa", "g1.fa", "g2.fa"])
    assert rc == 0
    got = capsys.readouterr().out
    want = open(os.path.join(GOLDEN, "dist_ji.tsv")).read()
    assert got == want


def test_golden_exact_tsv(in_golden, capsys):
    rc = climain.main(["dist", "-k", "21", "--use-full-khash-sets",
                       "--avoid-sorting", "g0.fa", "g1.fa"])
    assert rc == 0
    got = capsys.readouterr().out
    want = open(os.path.join(GOLDEN, "dist_exact.tsv")).read()
    assert got == want


def test_golden_mash_binary(in_golden, capsys):
    rc = climain.main(["dist", "-k", "21", "-S", "12", "-M", "-b",
                       "-O", "out.bin", "--avoid-sorting",
                       "g0.fa", "g1.fa", "g2.fa"])
    assert rc == 0
    capsys.readouterr()
    got = open("out.bin", "rb").read()
    want = open(os.path.join(GOLDEN, "dist_mash.bin"), "rb").read()
    assert got == want


def test_golden_sketch_registers(in_golden, capsys):
    rc = climain.main(["sketch", "-k", "21", "-S", "12", "g0.fa"])
    assert rc == 0
    capsys.readouterr()
    got = HLL.read("g0.fa.w.21.spacing.12.hll")
    want = HLL.read(os.path.join(GOLDEN, "golden.hll"))
    assert got.p == want.p
    assert (got.regs == want.regs).all()

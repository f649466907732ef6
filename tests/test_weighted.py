import numpy as np
import pytest

from dashing_tpu.cli import main as climain
from dashing_tpu.sketch import weighted


def test_occurrence_expand_counts(rng):
    vals = np.array([7, 7, 7, 9, 9, 11], np.uint64)
    out = weighted.occurrence_expand(vals)
    assert out.size == 6
    assert np.unique(out).size == 6  # all labeled occurrences distinct
    # deterministic
    assert (weighted.occurrence_expand(vals) == out).all()
    # first occurrences match regardless of multiplicities elsewhere
    out2 = weighted.occurrence_expand(np.array([7, 9, 11], np.uint64))
    assert set(out2.tolist()) <= set(out.tolist())


def test_multiset_jaccard_math(rng):
    # A has value v x3, B has v x1: multiset JI = min/max = 1/3 over that value
    a = weighted.occurrence_expand(np.array([5, 5, 5], np.uint64))
    b = weighted.occurrence_expand(np.array([5], np.uint64))
    inter = np.intersect1d(a, b).size
    union = np.union1d(a, b).size
    assert inter == 1 and union == 3


def test_cm_estimated_counts(rng):
    stream = np.repeat(rng.integers(0, 2**62, 500, dtype=np.uint64),
                       rng.integers(1, 6, 500))
    uniq, est = weighted.cm_estimated_counts(stream)
    true = np.unique(stream, return_counts=True)[1]
    # CM never underestimates; with 2^22 x 10 tables on 2k keys, exact
    assert (est >= true).all()
    assert (est == true).mean() > 0.99


def test_wj_cli(tmp_path, rng, capsys):
    # genome B = genome A repeated twice: plain JI ~ 1, weighted JI ~ 0.5
    seq = "".join(rng.choice(list("ACGT"), size=3000))
    a = tmp_path / "a.fa"
    b = tmp_path / "b.fa"
    a.write_text(f">a\n{seq}\n")
    b.write_text(f">b\n{seq}\n>b2\n{seq}\n")
    rc = climain.main(["dist", "-k", "21", "--use-full-khash-sets",
                       "--avoid-sorting", str(a), str(b)])
    assert rc == 0
    plain = capsys.readouterr().out
    ji_plain = float(plain.splitlines()[-2].split("\t")[-1])
    rc = climain.main(["dist", "-k", "21", "--use-full-khash-sets",
                       "--wj-exact", "--avoid-sorting", str(a), str(b)])
    assert rc == 0
    wj = capsys.readouterr().out
    ji_wj = float(wj.splitlines()[-2].split("\t")[-1])
    assert ji_plain > 0.98
    assert abs(ji_wj - 0.5) < 0.02, ji_wj


def test_wj_hll_cli(tmp_path, rng, capsys):
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    a = tmp_path / "a.fa"
    b = tmp_path / "b.fa"
    a.write_text(f">a\n{seq}\n")
    b.write_text(f">b\n{seq}\n>b2\n{seq}\n")
    rc = climain.main(["dist", "-k", "21", "-S", "14", "--wj",
                       "--avoid-sorting", str(a), str(b)])
    assert rc == 0
    out = capsys.readouterr().out
    ji = float(out.splitlines()[-2].split("\t")[-1])
    assert abs(ji - 0.5) < 0.08, ji

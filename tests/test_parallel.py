import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dashing_tpu.parallel import mesh as pmesh
from dashing_tpu.ops import pairwise as pw
from dashing_tpu.sketch import estimators as est
from dashing_tpu.sketch.hll import HLL
from dashing_tpu.ops.encode import Spacer, encode_oracle, tile_sequence


@pytest.fixture(scope="module")
def mesh8():
    return pmesh.make_mesh(8, ("d",))


def test_sharded_sketch_matches_host(rng, mesh8):
    k, p = 15, 11
    seq = rng.choice(list(b"ACGT"), size=40000).astype(np.uint8)
    tiles = tile_sequence(seq, 1024, k - 1)
    rows = (tiles.shape[0] // 8) * 8
    tiles = tiles[:rows]
    step = pmesh.sharded_sketch_step(mesh8, k=k, p=p)
    regs = step(pmesh.shard_rows(mesh8, jnp.asarray(tiles)),
                jnp.zeros(1 << p, jnp.int32))
    got = np.clip(np.asarray(regs), 0, 255).astype(np.uint8)
    # host oracle on exactly the same tile content
    want = HLL(p)
    sp = Spacer(k)
    for row in tiles:
        kmers = encode_oracle(row.tobytes(), sp)
        if kmers.size:
            want.addh_np(kmers)
    assert (got == want.regs).all()


def test_sharded_union_matches_tree(rng, mesh8):
    p = 10
    m = 1 << p
    regs = rng.integers(0, 40, size=(16, m)).astype(np.int32)
    fn = pmesh.sharded_union(mesh8)
    got = np.asarray(fn(pmesh.shard_rows(mesh8, jnp.asarray(regs))))
    assert (got == regs.max(axis=0)).all()


def test_sharded_pair_tile_matches_local(rng):
    mesh = pmesh.make_mesh(8, ("i", "j"))
    p = 10
    n = 8
    sketches = []
    for _ in range(n):
        h = HLL(p)
        h.addh_np(rng.integers(0, 2**62, 4000, dtype=np.uint64))
        sketches.append(h)
    regs = np.stack([s.regs for s in sketches]).astype(np.int32)
    kmax = int(regs.max()) + 1
    fn = pmesh.sharded_pair_tile(mesh, p=p, kmax=kmax, result_type=pw.JI,
                                 ksinv=1 / 21, estim=est.ERTL_MLE,
                                 jestim=est.ERTL_MLE)
    from jax.sharding import NamedSharding, PartitionSpec as P
    a = jax.device_put(jnp.asarray(regs), NamedSharding(mesh, P("i", None)))
    b = jax.device_put(jnp.asarray(regs), NamedSharding(mesh, P("j", None)))
    got = np.asarray(fn(a, b))
    want = pw.compare_tile(regs, regs, p, pw.JI, 1 / 21, est.ERTL_MLE,
                           est.ERTL_MLE, kmax)
    assert np.allclose(got, want, atol=1e-5)

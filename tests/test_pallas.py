import numpy as np
import jax.numpy as jnp
import pytest

from dashing_tpu.ops.pallas_encode import (encode_hash_keys,
                                           keys_to_update_inputs, BLOCK_R)
from dashing_tpu.ops.encode import encode_tile, tile_sequence
from dashing_tpu.ops.hll_update import bucket_rank
from dashing_tpu.hashes import wang_hash


@pytest.mark.parametrize("k,p", [(15, 10), (31, 14)])
def test_pallas_kernel_matches_xla(rng, k, p):
    seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=40000,
                     p=[0.24, 0.24, 0.24, 0.24, 0.04])
    tiles = tile_sequence(seq, 2048, k - 1)
    rows = tiles.shape[0]
    pad = (BLOCK_R - rows % BLOCK_R) % BLOCK_R
    if pad:
        tiles = np.concatenate(
            [tiles, np.full((pad, tiles.shape[1]), ord("N"), np.uint8)])
    keys = encode_hash_keys(jnp.asarray(tiles), k=k, p=p, interpret=True)
    idx, rank = keys_to_update_inputs(keys)

    km, valid = encode_tile(jnp.asarray(tiles), k=k, w=k,
                            positions=tuple(range(k)), span=k, canon=True)
    h = wang_hash(km)
    ridx, rrank = bucket_rank(h, p)
    rrank = jnp.where(valid, rrank, 0)
    v = np.asarray(valid)
    assert (np.asarray(rank) == np.asarray(rrank)).all()
    assert (np.asarray(idx)[v] == np.asarray(ridx)[v]).all()
    # invalid lanes must carry rank 0 (no-op under register max)
    assert (np.asarray(rank)[~v] == 0).all()


def test_packed_path_matches_dense(rng):
    """The 2-bit-packed upload path (host pack -> XLA unpack -> Pallas
    kernel) must produce bitwise-identical registers to the dense ASCII
    scatter path, including Ns and lowercase."""
    import jax.numpy as jnp
    from dashing_tpu import pipeline
    from dashing_tpu.ops.pallas_encode import (encode_hash_keys_from_codes,
                                               keys_to_update_inputs,
                                               unpack_2bit)
    from dashing_tpu.ops.hll_update import update_from_idx_rank
    from dashing_tpu.ops.encode import encode_tile
    from dashing_tpu.ops.hll_update import update_registers
    from dashing_tpu.hashes import wang_hash

    k, p = 21, 10
    R, C = 8, 512
    tile = rng.choice(np.frombuffer(b"ACGTacgtNN", np.uint8), size=(R, C))
    packed, vbits = pipeline._pack_tile_host(tile)
    code, valid = unpack_2bit(jnp.asarray(packed), jnp.asarray(vbits), C)
    keys = encode_hash_keys_from_codes(code, valid, k=k, p=p, canon=True,
                                       interpret=True)
    idx, rank = keys_to_update_inputs(keys)
    regs_packed = update_from_idx_rank(jnp.zeros(1 << p, jnp.int32),
                                       idx, rank)

    km, wvalid = encode_tile(jnp.asarray(tile), k=k, w=k,
                             positions=tuple(range(k)), span=k, canon=True)
    h = wang_hash(km)
    regs_dense = update_registers(jnp.zeros(1 << p, jnp.int32), h, wvalid, p)
    np.testing.assert_array_equal(np.asarray(regs_packed),
                                  np.asarray(regs_dense))

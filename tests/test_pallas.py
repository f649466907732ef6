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

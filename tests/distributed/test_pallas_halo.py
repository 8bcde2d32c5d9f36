"""Pallas remote-DMA halo vs ppermute equality (SURVEY.md §5.2/§5.8).

The RDMA path needs multi-chip TPU hardware or interpret-mode distributed
emulation; where unsupported, this test records a clean skip rather than a
false green."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def test_pallas_halo_matches_ppermute():
    # 1-D mesh: the interpret-mode DMA path supports single-named-dim
    # meshes only ("Meshes with more than 1 named dimension not
    # implemented in dma_start_p"); the RDMA semantics under test are
    # mesh-rank-independent.
    mesh = Mesh(np.array(jax.devices()[:8]), ("time",))
    h = 128
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((8 * h,)) + 1j * rng.standard_normal((8 * h,))
         ).astype(np.complex64)

    def via_ppermute(block):
        head = block[:h]
        halo = jax.lax.ppermute(head, "time",
                                [(i, i - 1) for i in range(1, 8)])
        return halo

    def via_pallas(block):
        from ofdm_uhd_tpu.kernels.pallas_halo import halo_from_right_pallas
        return halo_from_right_pallas(block[:h], "time", frame_axis=None,
                                      interpret=jax.default_backend() != "tpu")

    ref = jax.jit(jax.shard_map(via_ppermute, mesh=mesh, in_specs=P("time"),
                                out_specs=P("time"), check_vma=False))(x)
    try:
        got = jax.jit(jax.shard_map(via_pallas, mesh=mesh, in_specs=P("time"),
                                    out_specs=P("time"), check_vma=False))(x)
        got = np.asarray(got)
    except Exception as e:
        pytest.skip(f"remote-DMA halo unsupported on this runtime: "
                    f"{type(e).__name__}: {str(e)[:200]}")
    np.testing.assert_allclose(got, np.asarray(ref), atol=0)

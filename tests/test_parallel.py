"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from sddmm_tpu.data import generate
from sddmm_tpu.ops.reference import sddmm_reference
from sddmm_tpu.parallel.dist import DistributedHybridSDDMM
from sddmm_tpu.parallel.mesh import make_mesh
from sddmm_tpu.reorder.bsmr import BSMR
from sddmm_tpu.reorder.pack import pack
from sddmm_tpu.utils.check import check_values


@pytest.fixture(scope="module")
def packed_small():
    csr = generate.block_clustered(16, 12, block_prob=0.2, seed=11)
    bsmr = BSMR(0.3, 0.3, csr)
    return csr, pack(csr, bsmr)


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_distributed_matches_reference(packed_small, mesh_shape):
    csr, packed = packed_small
    mesh = make_mesh(mesh_shape, ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh)
    k = 32
    a = generate.make_dense(csr.m, k, seed=1)
    b = generate.make_dense(k, csr.n, seed=2)
    got = np.asarray(dist(a, b))
    want = sddmm_reference(a, b, csr)
    res = check_values(want, got)
    assert res.passed, f"mesh {mesh_shape}: {res}"


def test_distributed_grad_flows(packed_small):
    csr, packed = packed_small
    mesh = make_mesh((4, 2), ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh)
    k = 16
    a_pad, bt_pad = dist.prepare_operands(
        generate.make_dense(csr.m, k, seed=3),
        b=generate.make_dense(k, csr.n, seed=4))
    targets = jax.numpy.asarray(csr.values)

    def loss(a_pad, bt_pad):
        return ((dist.run_padded(a_pad, bt_pad, order="csr")
                 - targets) ** 2).mean()

    g = jax.grad(loss)(a_pad, bt_pad)
    assert np.isfinite(np.asarray(g).sum())
    assert np.abs(np.asarray(g)).max() > 0


def test_graft_entry_single_chip():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_no_flat_allgather_in_sharded_step(packed_small, mesh_shape):
    """The packed-order sharded step must not all-gather the flat value
    vector; its only collective is the psum over 'feat'."""
    from sddmm_tpu.parallel.dist import count_collectives

    csr, packed = packed_small
    mesh = make_mesh(mesh_shape, ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh)
    a_sh, bt_sh = dist.prepare_operands(
        generate.make_dense(csr.m, 32, seed=1),
        b=generate.make_dense(32, csr.n, seed=2))
    coll = count_collectives(dist.compiled_hlo(a_sh, bt_sh))
    assert coll["all-gather"] == 0, coll
    assert coll["all-to-all"] == 0, coll


def test_sharded_tile_balance(packed_small):
    csr, packed = packed_small
    mesh = make_mesh((4, 2), ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh)
    balance = dist.tile_balance()
    assert balance.sum() == csr.nnz  # every entry on exactly one device
    assert balance.shape == (4,)


def test_packed_targets_training_pattern(packed_small):
    """Sharded training loss over packed targets matches the CSR-order
    loss (the no-all-gather pattern models should use)."""
    csr, packed = packed_small
    mesh = make_mesh((4, 2), ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh)
    k = 16
    a = generate.make_dense(csr.m, k, seed=3)
    b = generate.make_dense(k, csr.n, seed=4)
    a_sh, bt_sh = dist.prepare_operands(a, b=b)
    targets, mask = dist.make_packed_targets(csr.values)
    pred = dist.run_padded(a_sh, bt_sh, order="packed")
    loss_packed = float(
        (jax.numpy.where(mask, pred - targets, 0.0) ** 2).sum()) / csr.nnz
    vals = np.asarray(dist.run_padded(a_sh, bt_sh, order="csr"))
    loss_csr = float(((vals - csr.values) ** 2).sum()) / csr.nnz
    assert abs(loss_packed - loss_csr) < 1e-6 * max(loss_csr, 1.0)

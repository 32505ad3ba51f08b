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


def test_distributed_grouped_chunked_hub():
    """Grouped (G=4), K-chunked (C=2), hub-slab (H=64) packing through
    the distributed path: exercises the res_member one-hot, gid layout,
    bt chunk sharding, and the per-device slab segment (ADVICE r2)."""
    from sddmm_tpu.reorder.cols import cluster_columns, hub_first_rank

    csr = generate.powerlaw_graph(256, avg_degree=10, seed=21)
    order = cluster_columns(csr, 0.3)
    rank = hub_first_rank(csr, 64, base_order=order)
    bsmr = BSMR(0.3, 0.05, csr, group_size=4, col_rank=rank, hub_cols=64)
    packed = pack(csr, bsmr)
    assert packed.hub_cols == 64 and packed.nnz_hub > 0
    mesh = make_mesh((4, 2), ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh, k_chunks=2)
    k = 32
    a = generate.make_dense(csr.m, k, seed=1)
    b = generate.make_dense(k, csr.n, seed=2)
    got = np.asarray(dist(a, b))
    want = sddmm_reference(a, b, csr)
    res = check_values(want, got)
    assert res.passed, res


def test_distributed_scale_mixed_families():
    """VERDICT r2 #8: a >=1M-nnz matrix exercising multiple tile
    families, >=3 bucket segments, and residual spread on the 8-device
    mesh — asserting device balance (max/mean <= 1.3), a fast vectorized
    shard-plan build, and correctness."""
    import time

    from sddmm_tpu.data.sparse import COO
    from sddmm_tpu.parallel.dist import _ShardPlan

    parts = [
        generate.block_clustered(32, 64, group_rows=128, group_cols=128,
                                 block_prob=0.05, block_density=0.4,
                                 noise_density=1e-5, seed=31),
        generate.block_clustered(256, 512, block_prob=0.01,
                                 block_density=0.65, noise_density=1e-5,
                                 seed=32),
        generate.banded(4096, 8192, bandwidth=60, fill=0.5, seed=33),
    ]
    n = 8192
    off, rows_l, cols_l = 0, [], []
    for p in parts:
        assert p.n == n
        rows_l.append(p.row_indices().astype(np.int64) + off)
        cols_l.append(p.col_idx.astype(np.int64))
        off += p.m
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    csr = COO((off, n), rows, cols,
              np.ones(len(rows), dtype=np.float32)).sorted_by_row().to_csr()
    assert csr.nnz >= 1_000_000

    bsmr = BSMR(0.3, 0.05, csr)
    packed = pack(csr, bsmr)
    n_buckets = (len(packed.super_buckets) + len(packed.quad_buckets)
                 + len(packed.pair_buckets) + len(packed.group_buckets))
    assert n_buckets >= 3, "wanted >=3 bucket segments"
    assert packed.num_super > 0, "coarse structure should form supertiles"
    assert (packed.num_quads + packed.num_pairs + packed.num_groups) > 0
    assert packed.nnz_res > 0, "noise should leave residual entries"

    # warm call pays the first-touch page allocation (the suite runs
    # memory-heavy tests first on a one-core box); the timed call
    # measures the algorithmic plan-build cost
    _ShardPlan(packed, 8)
    t0 = time.perf_counter()
    plan = _ShardPlan(packed, 8)
    plan_s = time.perf_counter() - t0
    assert plan_s < 1.5, f"shard plan build took {plan_s:.2f}s (>1.5s)"

    mesh = make_mesh((8, 1), ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh)
    balance = dist.tile_balance().astype(np.float64)
    assert balance.sum() == csr.nnz
    assert balance.max() / balance.mean() <= 1.3, balance

    k = 16
    a = generate.make_dense(csr.m, k, seed=1)
    b = generate.make_dense(k, csr.n, seed=2)
    got = np.asarray(dist(a, b))
    want = sddmm_reference(a, b, csr)
    res = check_values(want, got)
    assert res.passed, res


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_distributed_panels_layout(packed_small, mesh_shape):
    """a_layout='panels' on the sharded path: per-device panel-major A
    built by a free reshape of the panel-blocked local copy."""
    csr, packed = packed_small
    mesh = make_mesh(mesh_shape, ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh, a_layout="panels")
    k = 32
    a = generate.make_dense(csr.m, k, seed=1)
    b = generate.make_dense(k, csr.n, seed=2)
    got = np.asarray(dist(a, b))
    want = sddmm_reference(a, b, csr)
    res = check_values(want, got)
    assert res.passed, f"mesh {mesh_shape}: {res}"


def test_distributed_panels_grouped_chunked_hub():
    from sddmm_tpu.reorder.cols import cluster_columns, hub_first_rank

    csr = generate.powerlaw_graph(256, avg_degree=10, seed=21)
    order = cluster_columns(csr, 0.3)
    rank = hub_first_rank(csr, 64, base_order=order)
    bsmr = BSMR(0.3, 0.05, csr, group_size=4, col_rank=rank, hub_cols=64)
    packed = pack(csr, bsmr)
    mesh = make_mesh((4, 2), ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh, k_chunks=2,
                                  a_layout="panels")
    k = 32
    a = generate.make_dense(csr.m, k, seed=1)
    b = generate.make_dense(k, csr.n, seed=2)
    got = np.asarray(dist(a, b))
    want = sddmm_reference(a, b, csr)
    res = check_values(want, got)
    assert res.passed, res


def test_distributed_panels_grad_flows(packed_small):
    csr, packed = packed_small
    mesh = make_mesh((4, 2), ("rows", "feat"))
    dist = DistributedHybridSDDMM(packed, mesh, a_layout="panels")
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


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_distributed_dense_matches_reference(mesh_shape):
    from sddmm_tpu.parallel.dist import DistributedDenseSDDMM
    csr = generate.random_sparse(100, 96, density=0.3, seed=21)
    mesh = make_mesh(mesh_shape, ("rows", "feat"))
    dist = DistributedDenseSDDMM.from_csr(csr, mesh)
    k = 32
    a = generate.make_dense(csr.m, k, seed=1)
    b = generate.make_dense(k, csr.n, seed=2)
    got = np.asarray(dist(a, b))
    want = sddmm_reference(a, b, csr)
    res = check_values(want, got)
    assert res.passed, f"mesh {mesh_shape}: {res}"


def test_distributed_dense_single_psum_no_gather():
    from sddmm_tpu.parallel.dist import (DistributedDenseSDDMM,
                                         count_collectives)
    csr = generate.random_sparse(64, 64, density=0.3, seed=22)
    mesh = make_mesh((4, 2), ("rows", "feat"))
    dist = DistributedDenseSDDMM.from_csr(csr, mesh)
    a_sh, bt_sh = dist.prepare_operands(
        generate.make_dense(csr.m, 32, seed=1),
        b=generate.make_dense(32, csr.n, seed=2))
    counts = count_collectives(dist.compiled_hlo(a_sh, bt_sh))
    assert counts["all-gather"] == 0
    assert counts["all-reduce"] <= 1


def test_distributed_dense_grad_flows():
    from sddmm_tpu.parallel.dist import DistributedDenseSDDMM
    csr = generate.random_sparse(64, 64, density=0.3, seed=23)
    mesh = make_mesh((4, 2), ("rows", "feat"))
    dist = DistributedDenseSDDMM.from_csr(csr, mesh)
    a_sh, bt_sh = dist.prepare_operands(
        generate.make_dense(csr.m, 16, seed=3),
        b=generate.make_dense(16, csr.n, seed=4))
    targets = jax.numpy.asarray(csr.values)

    def loss(a_sh, bt_sh):
        return ((dist.run_padded(a_sh, bt_sh, order="csr")
                 - targets) ** 2).mean()

    g = jax.grad(loss)(a_sh, bt_sh)
    assert np.isfinite(np.asarray(g).sum())
    assert np.abs(np.asarray(g)).max() > 0


def test_distributed_dense_k_divisibility_error():
    from sddmm_tpu.parallel.dist import DistributedDenseSDDMM
    csr = generate.random_sparse(64, 64, density=0.3, seed=24)
    mesh = make_mesh((2, 4), ("rows", "feat"))
    dist = DistributedDenseSDDMM.from_csr(csr, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        dist.prepare_operands(generate.make_dense(csr.m, 18, seed=1),
                              b=generate.make_dense(18, csr.n, seed=2))
    # row padding: m not divisible by the rows axis still works
    assert dist.m_pad % 2 == 0 and dist.m_pad >= csr.m


def test_distributed_rowslab_bit_equal_single_chip():
    """Hot-row slab packings (pre and post selection, with and without
    a hub) run distributed and match the single-chip kernel bit-for-bit
    on every real packed slot (same float32 path and K-chunking)."""
    from sddmm_tpu.ops.hybrid import HybridSDDMM
    from sddmm_tpu.reorder.autotune import from_params

    csr = generate.powerlaw_graph(1024, avg_degree=12, seed=7)
    k = 32
    a = generate.make_dense(csr.m, k, seed=1).astype(np.float32)
    b = generate.make_dense(k, csr.n, seed=2).astype(np.float32)
    golden = sddmm_reference(a, b, csr)
    mesh = make_mesh((4, 2), ("rows", "feat"))
    for hub, pre in ((128, True), (0, True), (128, False)):
        t = from_params(csr, k, alpha=0.1, delta=0.05, hub_cols=hub,
                        hot_rows=64, hot_rows_pre=pre)
        pk = t.packed
        single = HybridSDDMM(pk, compute_dtype="float32", k_chunks=2)
        flat1 = np.asarray(single.run_padded(
            *single.prepare_operands(a, b=b), order="packed"))
        dist = DistributedHybridSDDMM(pk, mesh)
        a_sh, bt_sh = dist.prepare_operands(a, b=b)
        flat_sh = np.asarray(dist.run_padded(
            a_sh, bt_sh, order="packed")).reshape(-1)
        dest = np.asarray(dist.plan.csr_dest).reshape(-1)
        real = dest < pk.nnz
        assert (flat1[pk.inv_idx[dest[real]]].view(np.uint32)
                == flat_sh[real].view(np.uint32)).all(), (hub, pre)
        res = check_values(golden, np.asarray(
            dist.run_padded(a_sh, bt_sh, order="csr")))
        assert res.passed, (hub, pre, res)

"""Benchmark entry point: one JSON line with the headline metric.

Headline: hybrid BSMR SDDMM throughput (GFLOPS, = 2*NNZ*K/time) at K=128
on a block-structured sparse matrix, measured on the attached accelerator.
``vs_baseline`` compares against the reference's published mean K=128
GFLOPS over its SuiteSparse suite on an RTX 4090 (3452 GFLOPS, BASELINE.md).
"""

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_MEAN_GFLOPS_K128 = 3452.0  # BASELINE.md, RTX 4090, 503 matrices


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="small matrix (CI/CPU-friendly)")
    parser.add_argument("--k", type=int, default=128)
    parser.add_argument("--iterations", type=int, default=10)
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "tf32", "bfloat16"])
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax
    from sddmm_tpu.data import generate
    from sddmm_tpu.ops.hybrid import HybridSDDMM
    from sddmm_tpu.reorder.bsmr import BSMR
    from sddmm_tpu.reorder.pack import pack
    from sddmm_tpu.utils.timing import gflops, time_jax_fn

    def log(msg):
        if args.verbose:
            print(msg, file=sys.stderr)

    t0 = time.perf_counter()
    if args.quick:
        csr = generate.block_clustered(
            num_row_groups=64, num_col_groups=64, block_prob=0.08,
            block_density=0.7, noise_density=0.0005, seed=42)
    else:
        csr = generate.block_clustered(
            num_row_groups=1024, num_col_groups=1024, block_prob=0.008,
            block_density=0.65, noise_density=0.00001, seed=42)
    log(f"matrix: {csr.shape} nnz={csr.nnz} "
        f"({time.perf_counter() - t0:.1f}s gen)")

    t0 = time.perf_counter()
    bsmr = BSMR(0.3, 0.3, csr, method="batched")
    packed = pack(csr, bsmr)
    log(f"reorder+pack: clusters={bsmr.num_clusters} "
        f"blocks={packed.num_blocks} dense_nnz={packed.nnz_dense} "
        f"res_nnz={packed.nnz_res} density={packed.average_block_density:.3f}"
        f" ({time.perf_counter() - t0:.1f}s)")

    runner = HybridSDDMM(packed, compute_dtype=args.compute_dtype)
    a = generate.make_dense(csr.m, args.k, seed=1)
    b = generate.make_dense(args.k, csr.n, seed=2)
    a_pad, bt_pad = runner.prepare_operands(a, b=b)

    ms = runner.measure_kernel_ms(a_pad, bt_pad,
                                  iterations=max(args.iterations, 20),
                                  order="packed")
    value = gflops(csr.nnz, args.k, ms)
    log(f"device={jax.devices()[0].device_kind} packed-order time={ms:.3f}ms"
        f" gflops={value:.1f}")
    if args.verbose:
        ms_csr = runner.measure_kernel_ms(a_pad, bt_pad,
                                          iterations=max(args.iterations, 20),
                                          order="csr")
        log(f"csr-order time={ms_csr:.3f}ms "
            f"gflops={gflops(csr.nnz, args.k, ms_csr):.1f}")

    print(json.dumps({
        "metric": f"hybrid_sddmm_gflops_k{args.k}",
        "value": round(value, 1),
        "unit": "GFLOPS",
        "vs_baseline": round(value / REFERENCE_MEAN_GFLOPS_K128, 3),
    }))


if __name__ == "__main__":
    main()

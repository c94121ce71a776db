"""Pallas TPU kernel: the CLAHE LUT-apply bin sweep, VMEM-resident.

The XLA formulation (ops/clahe.py `_apply_band_sweep`) walks the 256
bins in `_SWEEP_CHUNK`-wide `fori_loop` steps; the loop-carried uint32
accumulator round-trips through HBM once per step, and that carry
traffic dominates the sweep's cost (measured: chunk 1 → 14.2 ms,
32 → 3.6 ms per 8×1080p batch — almost pure carry amortization).

This kernel runs the whole 256-bin sweep over one VMEM-resident block:
the accumulator lives in registers/VMEM for all 256 compare+selects, so
per output pixel the HBM traffic drops to one vals read + one acc write
(+ the packed table streamed once per row-block group) instead of
2·(256/chunk) accumulator round-trips. The packed per-column table
(built by the MXU one-hot matmuls in ops/clahe.py, unchanged) is reused
across consecutive row blocks of the same image via Pallas block
revisiting (the index map pins it per grid row), and the bilinear blend
stays in XLA afterwards — so both blend modes ("cv2" float and "fixed"
rational) remain bit-identical to the XLA sweep.

Mosaic constraints honored (found by bisection for the median kernel,
ops/pallas_median.py): int32 VMEM blocks (uint8/uint32 are rejected —
uint32 words are bit-cast through int32, masks after shifts make the
byte extraction sign-safe), 128-aligned lane dims (W padded with a
sentinel bin 256 that matches no value), 8-row sublane alignment (rows
padded likewise), and a fully unrolled static bin loop (no dynamic
sublane indexing).

Opt-in via ``RVT_CLAHE_SWEEP=pallas`` (default "xla"). Measured on the
emulated attach at PARITY with the chunked XLA sweep — full
clahe_planar_i32, 8×1080p batch, two A/B rounds: 8.80 vs 8.30 then 7.80
vs 7.96 ms/batch (xla vs pallas), inside run-to-run noise — unlike the
Pallas median, which loses 2× here. Since the emulator does not reward
saved HBM carry traffic, parity here implies headroom on real silicon;
re-measure with tools/autotune.py (sweep "clahe_sweep"). Bit-equality
with the XLA sweep is pinned in tests/test_pallas_kernels.py (interpret
mode) and was confirmed on-chip (identical probe values).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROW_BLK = 8          # int32 sublane tile
_SENTINEL = 256      # padded pixels match no bin → acc stays 0, sliced off


def _make_kernel():
    def kernel(vals_ref, packed_ref, out_ref):
        v = vals_ref[0]                        # (ROW_BLK, W) int32
        acc = jnp.zeros_like(v)
        for b in range(256):                   # static unroll: acc never
            row = packed_ref[0, b:b + 1, :]    # leaves registers/VMEM
            acc = jnp.where(v == b, row, acc)
        out_ref[0] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def sweep_pallas(vals: jnp.ndarray, packed: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """256-bin select sweep: out[n,y,x] = packed[n, vals[n,y,x], x].

    Args:
      vals: (N, R, W) integer plane values in [0, 255].
      packed: (N, 256, W) uint32 packed LUT words per (bin, column).
      interpret: run the Pallas interpreter (CPU testing).

    Returns (N, R, W) uint32 — bit-identical to the XLA chunked sweep.
    """
    n, r, w = vals.shape
    rp = -(-r // ROW_BLK) * ROW_BLK
    wp = -(-w // LANE) * LANE
    v = jnp.full((n, rp, wp), _SENTINEL, jnp.int32)
    v = v.at[:, :r, :w].set(vals.astype(jnp.int32))
    # uint32 → int32 is a bit-preserving reinterpret (modulo 2³²)
    pk = jnp.zeros((n, 256, wp), jnp.int32)
    pk = pk.at[:, :, :w].set(packed.astype(jnp.int32))

    out = pl.pallas_call(
        _make_kernel(),
        out_shape=jax.ShapeDtypeStruct((n, rp, wp), jnp.int32),
        grid=(n, rp // ROW_BLK),
        in_specs=[
            pl.BlockSpec((1, ROW_BLK, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256, wp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROW_BLK, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(v, pk)
    return out[:, :r, :w].astype(jnp.uint32)
